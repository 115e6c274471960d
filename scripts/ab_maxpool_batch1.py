"""A/B: reduce_window vs reshape-max maxpool on the batch-1 int8 graph.

The round-5 trace (scripts/trace_batch1.py + analyze_trace.py) shows the
TensorCore 99.3% busy at batch 1 with the two largest maxpools' reduce-
window ops eating ~244 us of the 1.056 ms (23%) at ~13-100 GB/s effective
— pathological for the VPU. The recorded reshape-maxpool negative result
(docs/PERFORMANCE.md) was measured on the TRAIN step (backward = mask
multiply vs select_and_scatter); this measures the inference-only regime
the trace indicts.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_maxpool_batch1.py
"""
import jax
import jax.numpy as jnp
import numpy as np

import gelslim_depth_tpu.models.unet as unet_mod
from gelslim_depth_tpu.config import GelslimConfig
from gelslim_depth_tpu.inference import Predictor, fused_predict_dual as _fpd
from gelslim_depth_tpu.models.quantize import unet_apply_int8
from gelslim_depth_tpu.models.unet import init_unet
from gelslim_depth_tpu.utils import device_time


def reshape_maxpool(x, m):
    n, h, w, c = x.shape
    x = x[:, : (h // m) * m, : (w // m) * m, :]
    x = x.reshape(n, h // m, m, w // m, m, c)
    return jnp.max(x, axis=(2, 4))


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
        # trailing carry arg: device_time chains iterations through it
        return jax.jit(
            lambda q, x, b, carry: _fpd(
                config, q.cfg, q.params, q.batch_stats, x + carry, b, (320, 427),
                compute_dtype=jnp.bfloat16,
                net_fn=lambda z: unet_apply_int8(q, z, compute_dtype=jnp.bfloat16),
            )
        )

    orig = unet_mod._maxpool
    xs = {b: jnp.asarray(rng.uniform(0, 255, (b, 6, 320, 427)).astype(np.float32))
          for b in (1, 2, 4, 64)}

    results = {}
    for name, mp in (("reduce_window", orig), ("reshape_max", reshape_maxpool)):
        unet_mod._maxpool = mp
        import gelslim_depth_tpu.models.quantize as qmod
        qmod._maxpool = mp
        # JAX's trace cache keys on make_graph's lambda CODE OBJECT, which
        # both arms share — without clearing, arm 2 reuses arm 1's jaxpr
        # and the A/B measures the same graph twice (found via the im2col
        # A/B's zero-delta timings; scripts/ab_im2col_fullgraph.py)
        jax.clear_caches()
        g = make_graph()
        y = np.asarray(g(qpred.q, xs[1], tac_base, 0.0))
        results.setdefault("out", {})[name] = y
        for b, x in xs.items():
            dt = device_time(g, qpred.q, x, tac_base, repeats=5)
            print(f"{name:>14} batch {b:>3}: {dt*1e3:8.3f} ms/iter "
                  f"({b/dt:8.1f} dual frames/s)")
            results[(name, b)] = dt
    unet_mod._maxpool = orig
    import gelslim_depth_tpu.models.quantize as qmod
    qmod._maxpool = orig

    a, b_ = results["out"]["reduce_window"], results["out"]["reshape_max"]
    print(f"max |delta| between the two graphs: {np.max(np.abs(a - b_)):.3e}")
    for b in xs:
        r, s = results[("reduce_window", b)], results[("reshape_max", b)]
        print(f"batch {b}: reshape_max is {r/s:.3f}x the reduce_window rate "
              f"({(r-s)*1e3:+.3f} ms)")


if __name__ == "__main__":
    main()
