"""AOT serving export: the fused inference graph as a StableHLO artifact.

Deployment story the reference never had (it serves live torch modules,
ref test_utils/test_depth_estimation.py:56-63) but a TPU-first framework
should: `jax.export` serializes the WHOLE fused dual-frame graph —
difference image -> resize -> normalize -> U-Net (bf16 or int8) ->
denormalize -> resize-back — with the weights baked in as constants, so a
serving process needs no Python model code and no tracing: deserialize,
`.call(frames, base)`, done. Artifacts are versioned StableHLO with
jax.export's compatibility guarantees.

Artifact layout: one `.gsx` zip holding `meta.json` (shapes, dtypes,
graph kind, target platforms) plus `graph_b<N>.bin` (one serialized
Exported per batch size, so serving picks the right static shape).

    from gelslim_depth_tpu.export import export_predictor, ExportedPredictor
    path = export_predictor(qpred, (320, 427), batch_sizes=(1, 64),
                            path="model.gsx")
    served = ExportedPredictor.load("model.gsx")
    depth_mm = served(frames, base_frame)   # (N, 2, 320, 427)

Cross-compilation: pass platforms=('tpu',) to export for TPU from a CPU
host (jax.export multi-platform lowering); default exports for the
current backend.
"""

from __future__ import annotations

import io
import json
import zipfile
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _dual_frame_fn(predictor):
    """(frames, base) -> depth closure with all state baked in, for either
    Predictor or QuantizedPredictor."""
    from gelslim_depth_tpu.inference import Predictor, QuantizedPredictor, fused_predict_dual

    if isinstance(predictor, QuantizedPredictor):
        from gelslim_depth_tpu.models.quantize import unet_apply_int8

        cfg, q, dtype = predictor.config, predictor.q, predictor.compute_dtype

        def fn(frames, base, output_size):
            return fused_predict_dual(
                cfg, q.cfg, q.params, q.batch_stats, frames, base, output_size,
                compute_dtype=dtype,
                net_fn=lambda x: unet_apply_int8(q, x, compute_dtype=dtype),
            )

        return fn, "int8_ptq"
    if isinstance(predictor, Predictor):
        cfg, ucfg = predictor.config, predictor.unet_cfg
        params, stats, dtype = predictor.params, predictor.batch_stats, predictor.compute_dtype

        def fn(frames, base, output_size):
            return fused_predict_dual(
                cfg, ucfg, params, stats, frames, base, output_size,
                compute_dtype=dtype,
            )

        return fn, "bf16" if dtype == jnp.bfloat16 else str(np.dtype(dtype))
    raise TypeError(f"cannot export {type(predictor).__name__}")


def export_predictor(
    predictor,
    output_size: Tuple[int, int],
    *,
    path: str,
    batch_sizes: Sequence[int] = (1, 64),
    frame_size: Tuple[int, int] = (320, 427),
    platforms: Optional[Sequence[str]] = None,
) -> str:
    """Serialize the fused dual-frame graph (weights baked in) for each
    batch size into one .gsx artifact. Returns path."""
    fn, kind = _dual_frame_fn(predictor)
    h, w = frame_size

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for n in batch_sizes:
            frames = jax.ShapeDtypeStruct((n, 6, h, w), jnp.float32)
            base = jax.ShapeDtypeStruct((6, h, w), jnp.float32)
            jitted = jax.jit(lambda fr, b: fn(fr, b, tuple(output_size)))
            if platforms is not None:
                exp = jax.export.export(jitted, platforms=tuple(platforms))(frames, base)
            else:
                exp = jax.export.export(jitted)(frames, base)
            zf.writestr(f"graph_b{n}.bin", exp.serialize())
        zf.writestr(
            "meta.json",
            json.dumps(
                {
                    "format": 1,
                    "kind": kind,
                    "batch_sizes": list(batch_sizes),
                    "frame_size": list(frame_size),
                    "output_size": list(output_size),
                    "platforms": list(platforms) if platforms else [jax.default_backend()],
                    "use_difference_image": bool(predictor.config.use_difference_image),
                }
            ),
        )
    return path


class ExportedPredictor:
    """Serve a .gsx artifact: no model code, no tracing — deserialize and
    call. Batches route to the exported graph of matching size; smaller
    batches pad up to the nearest exported size and slice the result."""

    def __init__(self, graphs, meta):
        self._graphs = graphs  # {batch_size: jax.export.Exported}
        self.meta = meta
        self.batch_sizes = sorted(graphs)

    @classmethod
    def load(cls, path: str) -> "ExportedPredictor":
        graphs = {}
        with zipfile.ZipFile(path) as zf:
            meta = json.loads(zf.read("meta.json").decode())
            for n in meta["batch_sizes"]:
                graphs[int(n)] = jax.export.deserialize(zf.read(f"graph_b{n}.bin"))
        return cls(graphs, meta)

    def __call__(self, frames, base_frame) -> jnp.ndarray:
        frames = jnp.asarray(frames, jnp.float32)
        base = jnp.asarray(base_frame, jnp.float32)
        n = frames.shape[0]
        fit = next((b for b in self.batch_sizes if b >= n), None)
        if fit is None:
            raise ValueError(
                f"batch {n} exceeds the largest exported size "
                f"{self.batch_sizes[-1]}; export with a larger batch_sizes"
            )
        if fit != n:
            pad = jnp.broadcast_to(frames[:1], (fit - n, *frames.shape[1:]))
            frames = jnp.concatenate([frames, pad], axis=0)
        out = self._graphs[fit].call(frames, base)
        return out[:n]
