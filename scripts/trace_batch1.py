"""Capture a TPU profiler trace of the batch-1 int8 serving graph.

VERDICT r4 item 4: the ~1.05 ms batch-1 int8 latency sits at ~23% of the
int8 roofline, and docs/PERFORMANCE.md attributes it to per-layer
small-shape latency across ~50 convs/BNs — but by argument, not by
measurement. This script measures it: it captures an xplane trace of the
exact graph bench.py times (flagship config, fused int8 chain, batch 1)
and scripts/analyze_trace.py decomposes the device timeline into per-op
busy time vs inter-op gaps.

Usage: python scripts/trace_batch1.py [outdir] [--reshape-max]
(default outdir /tmp/b1trace; --reshape-max swaps the maxpool for the
slice+reshape+max formulation to localize where its cost reappears)
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from gelslim_depth_tpu.config import GelslimConfig
from gelslim_depth_tpu.inference import Predictor, fused_predict_dual as _fpd
from gelslim_depth_tpu.models.quantize import unet_apply_int8
from gelslim_depth_tpu.models.unet import init_unet


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    outdir = args[0] if args else "/tmp/b1trace"
    if "--reshape-max" in sys.argv:
        import gelslim_depth_tpu.models.quantize as qmod
        import gelslim_depth_tpu.models.unet as umod

        def reshape_maxpool(x, m):
            n, h, w, c = x.shape
            x = x[:, : (h // m) * m, : (w // m) * m, :]
            return jnp.max(x.reshape(n, h // m, m, w // m, m, c), axis=(2, 4))

        umod._maxpool = qmod._maxpool = reshape_maxpool
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

    @jax.jit
    def graph_q(q, x, b):
        return _fpd(config, q.cfg, q.params, q.batch_stats, x, b, (320, 427),
                    compute_dtype=jnp.bfloat16,
                    net_fn=lambda z: unet_apply_int8(q, z, compute_dtype=jnp.bfloat16))

    x1 = jnp.asarray(rng.uniform(0, 255, (1, 6, 320, 427)).astype(np.float32))
    # warm up / compile
    graph_q(qpred.q, x1, tac_base).block_until_ready()
    graph_q(qpred.q, x1, tac_base).block_until_ready()

    with jax.profiler.trace(outdir):
        y = x1
        for _ in range(30):
            y = graph_q(qpred.q, x1, tac_base)
        jax.block_until_ready(y)
    print(f"trace written to {outdir}")


if __name__ == "__main__":
    main()
