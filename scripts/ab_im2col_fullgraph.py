"""A/B: shipped int8 graph vs im2col-dot deep convs, full fused graph.

Companion to scripts/ab_deepconv_batch1.py (which isolates the two
formulations). This measures the decision metric: the exact fused int8
serving graph bench.py times, with every int8 3x3 conv whose output
spatial extent is <= 20x26 (down_2, down_3, up_0 — the weight-heavy deep
tower the round-5 trace shows the graph stalling on) reformulated as
explicit im2col + int8 dot_general. int32 accumulation is exact in both
forms, so the two graphs must agree bit-for-bit.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_im2col_fullgraph.py
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import gelslim_depth_tpu.models.quantize as qmod
from gelslim_depth_tpu.config import GelslimConfig
from gelslim_depth_tpu.inference import Predictor, fused_predict_dual as _fpd
from gelslim_depth_tpu.models.unet import init_unet
from gelslim_depth_tpu.utils import device_time

SPATIAL_THRESHOLD = 520  # h*w of the conv OUTPUT; 20x26 and deeper


def _conv_int8_pre_im2col(qx, in_scale, w8, w_scale, pad):
    """im2col + dot formulation of _conv_int8_pre for small spatial
    extents; falls back to the conv emitter above the threshold."""
    kh, kw, cin, cout = w8.shape
    n = qx.shape[0]
    xp = jnp.pad(qx, ((0, 0), tuple(pad[0]), tuple(pad[1]), (0, 0)))
    ho, wo = xp.shape[1] - kh + 1, xp.shape[2] - kw + 1
    if ho * wo > SPATIAL_THRESHOLD:
        return _SHIPPED(qx, in_scale, w8, w_scale, pad)
    views = [xp[:, dy:dy + ho, dx:dx + wo, :] for dy in range(kh) for dx in range(kw)]
    patches = jnp.concatenate(views, axis=-1)
    y = lax.dot_general(
        patches.reshape(n * ho * wo, kh * kw * cin),
        w8.reshape(kh * kw * cin, cout),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).reshape(n, ho, wo, cout)
    return y.astype(jnp.float32) * (jnp.asarray(in_scale, jnp.float32) * w_scale)


_SHIPPED = qmod._conv_int8_pre


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/gelslim_jax_cache")
    config = GelslimConfig(
        CNN_dimensions=(64, 128, 256, 512, 1024),
        input_tactile_image_size=(160, 213),
        image_normalization_method="0_255_to_0_1",
        depth_normalization_method="min_max_to_0_-1",
        depth_normalization_parameters=(-1.9180814027786255, 0.0),
        norm_scale=0.9,
        use_difference_image=True,
    )
    unet_cfg = config.unet_config()
    params, stats = init_unet(jax.random.PRNGKey(0), unet_cfg)
    rng = np.random.RandomState(0)
    tac_base = jnp.asarray(rng.uniform(0, 255, (6, 320, 427)).astype(np.float32))
    calib = jnp.asarray(rng.uniform(0, 255, (8, 6, 320, 427)).astype(np.float32))
    pred = Predictor(config, params, stats, compute_dtype=jnp.bfloat16)
    qpred = pred.quantize(calib, tac_base)

    def make_graph():
        return jax.jit(
            lambda q, x, b, carry: _fpd(
                config, q.cfg, q.params, q.batch_stats, x + carry, b, (320, 427),
                compute_dtype=jnp.bfloat16,
                net_fn=lambda z: qmod.unet_apply_int8(q, z, compute_dtype=jnp.bfloat16),
            )
        )

    xs = {b: jnp.asarray(rng.uniform(0, 255, (b, 6, 320, 427)).astype(np.float32))
          for b in (1, 2, 4, 64)}
    results = {}
    for name, impl in (("conv", _SHIPPED), ("im2col", _conv_int8_pre_im2col)):
        qmod._conv_int8_pre = impl
        # make_graph's lambdas share one CODE OBJECT across arms, and JAX's
        # trace cache keys on it — without clearing, arm 2 silently reuses
        # arm 1's jaxpr and the A/B measures the same graph twice (verified:
        # identical-to-0.1% timings and zero dot_generals in the lowered
        # HLO until this was added)
        jax.clear_caches()
        g = make_graph()
        results.setdefault("out", {})[name] = np.asarray(g(qpred.q, xs[1], tac_base, 0.0))
        for b, x in xs.items():
            dt = device_time(g, qpred.q, x, tac_base, iters=256 if b == 64 else 1024,
                             repeats=5)
            print(f"{name:>7} batch {b:>3}: {dt*1e3:8.3f} ms/dispatch "
                  f"({b/dt:8.1f} dual frames/s)", flush=True)
            results[(name, b)] = dt
    qmod._conv_int8_pre = _SHIPPED

    a, b_ = results["out"]["conv"], results["out"]["im2col"]
    print(f"max |delta| between the two graphs: {np.max(np.abs(a - b_)):.3e}")
    for b in xs:
        r, s = results[("conv", b)], results[("im2col", b)]
        print(f"batch {b}: im2col is {r/s:.3f}x the conv rate ({(r-s)*1e3:+.3f} ms)")


if __name__ == "__main__":
    main()
