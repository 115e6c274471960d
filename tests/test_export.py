"""AOT serving export (gelslim_depth_tpu/export.py): StableHLO artifact
round-trips — serialize the fused dual-frame graph with weights baked in,
reload WITHOUT the predictor objects, and get identical outputs."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gelslim_depth_tpu.config import GelslimConfig
from gelslim_depth_tpu.export import ExportedPredictor, export_predictor
from gelslim_depth_tpu.inference import Predictor
from gelslim_depth_tpu.models.unet import init_unet

DIMS = (8, 16, 32)


@pytest.fixture(scope="module")
def predictor():
    config = GelslimConfig(
        CNN_dimensions=DIMS,
        input_tactile_image_size=(32, 43),
        image_normalization_method="0_255_to_0_1",
        depth_normalization_method="min_max_to_0_-1",
        depth_normalization_parameters=(-1.9, 0.0),
        norm_scale=0.9,
        use_difference_image=True,
    )
    params, stats = init_unet(jax.random.PRNGKey(2), config.unet_config())
    return Predictor(config, params, stats)


def test_export_roundtrip_float(tmp_path, predictor):
    rng = np.random.RandomState(11)  # own rng: shared-fixture state must not change the data
    path = str(tmp_path / "model.gsx")
    export_predictor(
        predictor, (64, 86), path=path, batch_sizes=(1, 4), frame_size=(64, 86)
    )
    served = ExportedPredictor.load(path)
    assert served.batch_sizes == [1, 4]
    assert served.meta["kind"] in ("float32", "bf16")

    frames = rng.uniform(0, 255, (4, 6, 64, 86)).astype(np.float32)
    base = rng.uniform(0, 255, (6, 64, 86)).astype(np.float32)
    got = np.asarray(served(frames, base))
    want = np.asarray(predictor.predict_dual_frames(frames, base, (64, 86)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    # odd batch: composed/padded routing still returns exact rows
    got2 = np.asarray(served(frames[:3], base))
    np.testing.assert_allclose(got2, want[:3], rtol=1e-6, atol=1e-6)
    # a batch beyond the largest exported size composes multiple calls
    # (round 3 raised here)
    big = np.repeat(frames, 2, axis=0)  # 8 rows on a (1, 4) artifact
    want_big = np.asarray(predictor.predict_dual_frames(big, base, (64, 86)))
    np.testing.assert_allclose(np.asarray(served(big, base)), want_big,
                               rtol=1e-6, atol=1e-6)
    assert served.dispatch_plan(8) == [(4, 4), (4, 4)]


class _CountingGraph:
    def __init__(self, inner):
        self.inner, self.calls = inner, 0

    def call(self, *a):
        self.calls += 1
        return self.inner.call(*a)


def test_dispatch_composition_avoids_padding_waste(tmp_path, predictor):
    """VERDICT r3 item 6: batch 2 on a (1, 64) artifact must execute two
    b1 graphs, not pad to the 64-graph (32x the FLOPs); large batches
    chunk into the largest graphs; near-miss batches still pad when
    composition would cost more under the per-call overhead model."""
    rng = np.random.RandomState(13)
    path = str(tmp_path / "model_164.gsx")
    export_predictor(
        predictor, (64, 86), path=path, batch_sizes=(1, 64), frame_size=(64, 86)
    )
    served = ExportedPredictor.load(path)
    assert served.dispatch_plan(2) == [(1, 1), (1, 1)]
    assert served.dispatch_plan(64) == [(64, 64)]
    assert served.dispatch_plan(70) == [(64, 64)] + [(1, 1)] * 6
    # 63 single-frame calls lose to one padded 64-graph under the
    # call-overhead cost model
    assert served.dispatch_plan(63) == [(64, 63)]
    # beyond the largest exported size: composes instead of raising
    assert served.dispatch_plan(128) == [(64, 64), (64, 64)]

    served._graphs = {b: _CountingGraph(g) for b, g in served._graphs.items()}
    frames = rng.uniform(0, 255, (2, 6, 64, 86)).astype(np.float32)
    base = rng.uniform(0, 255, (6, 64, 86)).astype(np.float32)
    got = np.asarray(served(frames, base))
    assert served._graphs[1].calls == 2 and served._graphs[64].calls == 0
    want = np.asarray(predictor.predict_dual_frames(frames, base, (64, 86)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_export_roundtrip_int8(tmp_path, predictor):
    """The int8 PTQ serving graph exports with its quantized weights and
    static activation scales baked in."""
    rng = np.random.RandomState(12)
    frames = jnp.asarray(rng.uniform(0, 255, (4, 6, 64, 86)).astype(np.float32))
    base = jnp.asarray(rng.uniform(0, 255, (6, 64, 86)).astype(np.float32))
    qpred = predictor.quantize(frames, base)

    path = str(tmp_path / "model_int8.gsx")
    export_predictor(qpred, (64, 86), path=path, batch_sizes=(2,), frame_size=(64, 86))
    served = ExportedPredictor.load(path)
    assert served.meta["kind"] == "int8_ptq"

    got = np.asarray(served(frames[:2], base))
    want = np.asarray(qpred.predict_dual_frames(frames[:2], base, (64, 86)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_export_roundtrip_int8_upconvs(tmp_path, predictor):
    """An int8 artifact with row-split int8 upconvs (quantize
    --int8_upconvs) exports and serves identically to the live graph —
    the exported StableHLO carries the packed upconv weights too."""
    rng = np.random.RandomState(13)
    frames = jnp.asarray(rng.uniform(0, 255, (4, 6, 64, 86)).astype(np.float32))
    base = jnp.asarray(rng.uniform(0, 255, (6, 64, 86)).astype(np.float32))
    qpred = predictor.quantize(frames, base, quantize_upconvs=True)
    assert "upconv" in qpred.q.w8["up_0"]

    path = str(tmp_path / "model_int8u.gsx")
    export_predictor(qpred, (64, 86), path=path, batch_sizes=(2,), frame_size=(64, 86))
    served = ExportedPredictor.load(path)
    assert served.meta["kind"] == "int8_ptq"

    got = np.asarray(served(frames[:2], base))
    want = np.asarray(qpred.predict_dual_frames(frames[:2], base, (64, 86)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
