"""int8 post-training quantization (models/quantize.py): weight/activation
quantization correctness, site coverage, end-to-end mm accuracy vs the
float graph, and the QuantizedPredictor API.

This is new TPU-native capability with no reference equivalent (the
reference serves f32 torch), so the bar is self-consistency against the
float graph, with the accuracy delta surfaced, not hidden.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gelslim_depth_tpu.config import GelslimConfig
from gelslim_depth_tpu.models.unet import UNetConfig, init_unet, unet_apply
from gelslim_depth_tpu.models.quantize import (
    _quantized_sites,
    quantize_unet,
    quantize_weight,
    unet_apply_int8,
)
from gelslim_depth_tpu.inference import Predictor

DIMS = (8, 16, 32)


@pytest.fixture(scope="module")
def tiny_net():
    cfg = UNetConfig(layer_dimensions=DIMS)
    params, stats = init_unet(jax.random.PRNGKey(0), cfg)
    return cfg, params, stats


def test_quantize_weight_roundtrip(rng):
    w = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 3, 8, 16)).astype(np.float32))
    q, s = quantize_weight(w)
    assert q.dtype == jnp.int8 and s.shape == (16,)
    # dequantization error bounded by half a quantization step per element
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(w))
    assert err.max() <= np.asarray(s).max() / 2 + 1e-7
    # zero-channel guard
    q0, s0 = quantize_weight(jnp.zeros((3, 3, 4, 2)))
    assert np.all(np.asarray(s0) == 1.0) and np.all(np.asarray(q0) == 0)


def test_quantized_sites_cover_all_but_first_conv(tiny_net):
    cfg, _, _ = tiny_net
    sites = set(_quantized_sites(cfg))
    assert ("inc", "conv1") not in sites  # 3-channel input stays float
    assert ("inc", "conv2") in sites
    for i in range(cfg.num_levels - 1):
        assert (f"down_{i}", "conv1") in sites and (f"down_{i}", "conv2") in sites
        assert (f"up_{i}", "conv1") in sites and (f"up_{i}", "conv2") in sites


def test_int8_forward_close_to_float(tiny_net, rng):
    cfg, params, stats = tiny_net
    x = jnp.asarray(rng.uniform(0, 1, (4, 3, 32, 43)).astype(np.float32))
    q = quantize_unet(cfg, params, stats, x)
    y_q = unet_apply_int8(q, x, compute_dtype=jnp.float32)
    y_f, _ = unet_apply(cfg, params, stats, x, train=False)
    assert y_q.shape == y_f.shape
    spread = float(jnp.max(y_f) - jnp.min(y_f)) + 1e-6
    rmse = float(jnp.sqrt(jnp.mean((y_q - y_f) ** 2)))
    # int8 error well under the output spread, and the self-report agrees
    assert rmse < 0.05 * spread + 5e-3, rmse
    assert abs(float(q.float_delta) - rmse) < 1e-4 + 0.5 * rmse


def test_int8_forward_new_inputs(tiny_net, rng):
    """Static calibration scales must hold on inputs beyond the
    calibration batch (same distribution)."""
    cfg, params, stats = tiny_net
    calib = jnp.asarray(rng.uniform(0, 1, (4, 3, 32, 43)).astype(np.float32))
    q = quantize_unet(cfg, params, stats, calib)
    x = jnp.asarray(rng.uniform(0, 1, (2, 3, 32, 43)).astype(np.float32))
    y_q = unet_apply_int8(q, x, compute_dtype=jnp.float32)
    y_f, _ = unet_apply(cfg, params, stats, x, train=False)
    spread = float(jnp.max(y_f) - jnp.min(y_f)) + 1e-6
    assert float(jnp.sqrt(jnp.mean((y_q - y_f) ** 2))) < 0.1 * spread + 5e-3


def test_k5_config_quantizes(rng):
    """Decoder convs are always 3x3 (reference quirk) — quantization must
    follow the real shapes for kernel_size != 3."""
    cfg = UNetConfig(layer_dimensions=(4, 8), kernel_size=5)
    params, stats = init_unet(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(rng.uniform(0, 1, (2, 3, 24, 33)).astype(np.float32))
    q = quantize_unet(cfg, params, stats, x)
    assert q.w8["up_0"]["conv1"].shape[:2] == (3, 3)
    assert q.w8["down_0"]["conv1"].shape[:2] == (5, 5)
    y = unet_apply_int8(q, x)
    assert np.isfinite(np.asarray(y)).all()


def test_quantized_predictor_end_to_end(rng):
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
    pred = Predictor(config, params, stats)

    frames = jnp.asarray(rng.uniform(0, 255, (4, 6, 64, 86)).astype(np.float32))
    base = jnp.asarray(rng.uniform(0, 255, (6, 64, 86)).astype(np.float32))
    qpred = pred.quantize(frames, base)
    assert qpred.delta_mm < 0.05, qpred.delta_mm

    y_q = np.asarray(qpred.predict_dual_frames(frames[:2], base, (64, 86)))
    y_f = np.asarray(pred.predict_dual_frames(frames[:2], base, (64, 86)))
    assert y_q.shape == y_f.shape == (2, 2, 64, 86)
    assert np.sqrt(np.mean((y_q - y_f) ** 2)) < 0.05  # mm

    # single-finger path too
    imgs = jnp.asarray(rng.uniform(0, 255, (2, 3, 64, 86)).astype(np.float32))
    y1 = np.asarray(qpred.predict_depth_from_RGB(imgs, (64, 86)))
    y2 = np.asarray(pred.predict_depth_from_RGB(imgs, (64, 86)))
    assert np.sqrt(np.mean((y1 - y2) ** 2)) < 0.05


def test_tactile_calibration_held_out_fitness(rng):
    """int8 fitness the honest way (round-2 verdict): calibrate on
    REALISTIC tactile frames (smooth contact blobs on a noisy base —
    low-contrast, spatially-correlated diff images, the regime real
    serving sees), then measure delta_mm on a HELD-OUT batch from a
    different synthetic object, across the percentile knob. The held-out
    delta must stay well inside the 0.05 mm parity budget, and the
    calibration self-report must not understate the held-out error by an
    order of magnitude."""
    from gelslim_depth_tpu.data.synthetic import make_synthetic_object

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
    pred = Predictor(config, params, stats)

    calib_obj = make_synthetic_object(np.random.RandomState(20), n=8, image_size=(64, 86))
    held_obj = make_synthetic_object(np.random.RandomState(21), n=4, image_size=(64, 86))
    calib = jnp.asarray(calib_obj["tactile_image"])
    base = jnp.asarray(calib_obj["base_tactile_image"][0])
    held = jnp.asarray(held_obj["tactile_image"])

    y_f = np.asarray(pred.predict_dual_frames(held, base, (64, 86)))
    mm = abs(config.depth_normalization_parameters[0]) / config.norm_scale

    held_deltas = {}
    for pct in (100.0, 99.5, 95.0):
        qpred = pred.quantize(calib, base, percentile=pct)
        y_q = np.asarray(qpred.predict_dual_frames(held, base, (64, 86)))
        held_deltas[pct] = float(np.sqrt(np.mean((y_q - y_f) ** 2)))
        # self-report on the calibration batch must be the same order as
        # the held-out truth (no calibration-batch overfitting illusion)
        assert qpred.delta_mm < 10 * max(held_deltas[pct], 1e-6) + 1e-6

    # max-calibration must already be inside the budget on tactile data
    assert held_deltas[100.0] < 0.02, held_deltas
    # aggressive clipping on low-outlier tactile activations should not be
    # catastrophically worse (the knob exists for drifted distributions)
    assert held_deltas[95.0] < 0.05, held_deltas
    del mm


def test_dp_int8_fused_predictor_matches_single_device(rng):
    """Config-5 serving at int8: batch-sharded quantized predictor over
    the 8-virtual-device mesh must equal the single-device quantized
    output exactly (the pipeline has no cross-device math)."""
    from gelslim_depth_tpu.parallel import make_mesh, make_dp_fused_predictor_int8, replicate

    config = GelslimConfig(
        CNN_dimensions=(4, 8),
        input_tactile_image_size=(16, 21),
        image_normalization_method="0_255_to_0_1",
        depth_normalization_method="min_max_to_0_-1",
        depth_normalization_parameters=(-1.9, 0.0),
        norm_scale=0.9,
        use_difference_image=True,
    )
    params, stats = init_unet(jax.random.PRNGKey(3), config.unet_config())
    pred = Predictor(config, params, stats, compute_dtype=jnp.float32)
    frames = jnp.asarray(rng.uniform(0, 255, (8, 6, 32, 43)).astype(np.float32))
    base = jnp.asarray(rng.uniform(0, 255, (6, 32, 43)).astype(np.float32))
    qpred = pred.quantize(frames, base)

    mesh = make_mesh(8)
    dp = make_dp_fused_predictor_int8(
        config, qpred.q, mesh, (32, 43), compute_dtype=jnp.float32
    )
    got = np.asarray(dp(replicate(mesh, qpred.q), frames, base))
    want = np.asarray(qpred.predict_dual_frames(frames, base, (32, 43)))
    assert got.shape == (8, 2, 32, 43)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_quantized_checkpoint_roundtrip(tmp_path, rng):
    """save_quantized/load_quantized: the reloaded QuantizedPredictor must
    produce bit-identical outputs without re-calibration."""
    config = GelslimConfig(
        weights_name="qtiny",
        CNN_dimensions=(4, 8),
        input_tactile_image_size=(16, 21),
        image_normalization_method="0_255_to_0_1",
        depth_normalization_method="min_max_to_0_-1",
        depth_normalization_parameters=(-1.9, 0.0),
        norm_scale=0.9,
        use_difference_image=True,
    )
    params, stats = init_unet(jax.random.PRNGKey(4), config.unet_config())
    pred = Predictor(config, params, stats, compute_dtype=jnp.float32)
    frames = jnp.asarray(rng.uniform(0, 255, (4, 6, 32, 43)).astype(np.float32))
    base = jnp.asarray(rng.uniform(0, 255, (6, 32, 43)).astype(np.float32))
    qpred = pred.quantize(frames, base)
    qpred.save(str(tmp_path))

    from gelslim_depth_tpu.inference import QuantizedPredictor

    loaded = QuantizedPredictor.from_checkpoint(str(tmp_path), compute_dtype=jnp.float32)
    assert abs(loaded.delta_mm - qpred.delta_mm) < 1e-9
    assert loaded.q.act_scale == qpred.q.act_scale
    a = np.asarray(qpred.predict_dual_frames(frames[:2], base, (32, 43)))
    b = np.asarray(loaded.predict_dual_frames(frames[:2], base, (32, 43)))
    np.testing.assert_array_equal(a, b)


def test_streaming_engine_accepts_quantized_predictor(rng):
    """StreamingEngine pipelines any predictor exposing
    predict_dual_frames — including the int8 one (config-5 streaming)."""
    from gelslim_depth_tpu.inference import StreamingEngine

    config = GelslimConfig(
        CNN_dimensions=(4, 8),
        input_tactile_image_size=(16, 21),
        image_normalization_method="0_255_to_0_1",
        depth_normalization_method="min_max_to_0_-1",
        depth_normalization_parameters=(-1.9, 0.0),
        norm_scale=0.9,
        use_difference_image=True,
    )
    params, stats = init_unet(jax.random.PRNGKey(5), config.unet_config())
    pred = Predictor(config, params, stats, compute_dtype=jnp.float32)
    frames = rng.uniform(0, 255, (4, 6, 32, 43)).astype(np.float32)
    base = rng.uniform(0, 255, (6, 32, 43)).astype(np.float32)
    qpred = pred.quantize(jnp.asarray(frames), jnp.asarray(base))

    eng = StreamingEngine(qpred, (32, 43), base_frame=base)
    for f in frames:
        eng.submit(f)
    outs = eng.drain()
    assert len(outs) == 4 and outs[0].shape == (1, 2, 32, 43)
    want = np.asarray(qpred.predict_dual_frames(frames[:1], base, (32, 43)))
    np.testing.assert_allclose(outs[0], want, rtol=1e-6)


def test_percentile_calibration(tiny_net, rng):
    """percentile < 100 clips outliers: scales shrink vs max-calibration,
    and accuracy on in-distribution inputs stays bounded."""
    from gelslim_depth_tpu.models.quantize import calibrate_act_scales

    cfg, params, stats = tiny_net
    x = jnp.asarray(rng.uniform(0, 1, (4, 3, 32, 43)).astype(np.float32))
    full = calibrate_act_scales(cfg, params, stats, x)
    clipped = calibrate_act_scales(cfg, params, stats, x, percentile=99.0)
    assert set(full) == set(clipped)
    assert all(clipped[k] <= full[k] + 1e-12 for k in full)
    assert any(clipped[k] < full[k] for k in full)

    q = quantize_unet(cfg, params, stats, x, percentile=99.0)
    y_q = unet_apply_int8(q, x, compute_dtype=jnp.float32)
    y_f, _ = unet_apply(cfg, params, stats, x, train=False)
    spread = float(jnp.max(y_f) - jnp.min(y_f)) + 1e-6
    assert float(jnp.sqrt(jnp.mean((y_q - y_f) ** 2))) < 0.1 * spread + 5e-3


def test_delta_mm_conversion_per_method(tiny_net, rng):
    """delta_mm must use the configured depth method's denormalization
    slope: (max-min)/norm_scale for min_max methods, std for mean_std."""
    from gelslim_depth_tpu.inference import QuantizedPredictor

    cfg, params, stats = tiny_net
    x = jnp.asarray(rng.uniform(0, 1, (2, 3, 32, 43)).astype(np.float32))
    q = quantize_unet(cfg, params, stats, x)
    delta = float(q.float_delta)

    mm_cfg = GelslimConfig(
        CNN_dimensions=DIMS, depth_normalization_method="min_max_to_0_-1",
        depth_normalization_parameters=(-1.8, 0.0), norm_scale=0.9,
    )
    qp = QuantizedPredictor(mm_cfg, q)
    assert abs(qp.delta_mm - delta * 1.8 / 0.9) < 1e-9

    ms_cfg = GelslimConfig(
        CNN_dimensions=DIMS, depth_normalization_method="mean_std",
        depth_normalization_parameters=(-1.8, 0.0, -0.4, 0.25), norm_scale=0.9,
    )
    qp = QuantizedPredictor(ms_cfg, q)
    assert abs(qp.delta_mm - delta * 0.25) < 1e-9

    none_cfg = GelslimConfig(CNN_dimensions=DIMS)
    qp = QuantizedPredictor(none_cfg, q)
    with pytest.raises(ValueError):
        qp.delta_mm


def test_predictor_quantize_percentile_passthrough(rng):
    """Predictor.quantize(percentile=...) must reach the calibrator."""
    config = GelslimConfig(
        CNN_dimensions=(4, 8), input_tactile_image_size=(16, 21),
        image_normalization_method="0_255_to_0_1",
        depth_normalization_method="min_max_to_0_-1",
        depth_normalization_parameters=(-1.9, 0.0), norm_scale=0.9,
        use_difference_image=True,
    )
    params, stats = init_unet(jax.random.PRNGKey(6), config.unet_config())
    pred = Predictor(config, params, stats, compute_dtype=jnp.float32)
    frames = jnp.asarray(rng.uniform(0, 255, (4, 6, 32, 43)).astype(np.float32))
    base = jnp.asarray(rng.uniform(0, 255, (6, 32, 43)).astype(np.float32))
    q_full = pred.quantize(frames, base).q
    q_clip = pred.quantize(frames, base, percentile=95.0).q
    assert any(q_clip.act_scale[k] < q_full.act_scale[k] for k in q_full.act_scale)


def test_load_quantized_legacy_json_fallback(tmp_path, rng):
    """Artifacts written before the _int8.json rename stored the config as
    <name>.json; the loader must still read them."""
    import os

    from gelslim_depth_tpu.train.checkpoint import load_quantized, save_quantized

    config = GelslimConfig(
        weights_name="qleg", CNN_dimensions=(4, 8),
        input_tactile_image_size=(16, 21),
        image_normalization_method="0_255_to_0_1",
        depth_normalization_method="min_max_to_0_-1",
        depth_normalization_parameters=(-1.9, 0.0), norm_scale=0.9,
    )
    params, stats = init_unet(jax.random.PRNGKey(7), config.unet_config())
    x = jnp.asarray(rng.uniform(0, 1, (2, 3, 16, 21)).astype(np.float32))
    q = quantize_unet(config.unet_config(), params, stats, x)
    save_quantized(str(tmp_path), config, q)
    # simulate a legacy artifact: config only under the bare name
    os.rename(tmp_path / "qleg_int8.json", tmp_path / "qleg.json")
    cfg2, q2 = load_quantized(str(tmp_path))
    assert cfg2.weights_name == "qleg"
    np.testing.assert_array_equal(
        np.asarray(q2.w8["down_0"]["conv1"]), np.asarray(q.w8["down_0"]["conv1"])
    )


def test_quantization_commutes_with_pad_and_concat(rng):
    """The invariant int8-resident skips rely on (models/quantize.py
    _apply_int8): at equal scale, quantizing each concat half at
    PRODUCTION — including zero-padding in int8 — equals quantizing the
    assembled concat at CONSUMPTION, element for element."""
    from gelslim_depth_tpu.models.quantize import _quant_act

    s = jnp.float32(0.0371)
    skip = jnp.asarray(rng.uniform(-3, 3, (2, 8, 9, 4)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-3, 3, (2, 7, 8, 4)).astype(np.float32))
    widths = ((0, 0), (0, 1), (1, 0), (0, 0))
    consumption = _quant_act(
        jnp.concatenate([skip, jnp.pad(y, widths)], axis=-1), s
    )
    production = jnp.concatenate(
        [_quant_act(skip, s), jnp.pad(_quant_act(y, s), widths)], axis=-1
    )
    np.testing.assert_array_equal(np.asarray(production), np.asarray(consumption))


def test_load_quantized_rejects_truncated_artifact(tmp_path, rng):
    """A partially-written _int8.npz (interrupted save, partial copy) must
    fail AT LOAD with an error naming the missing int8 arrays — not load
    'successfully' and die later inside jit tracing with an opaque
    KeyError from _apply_int8."""
    from gelslim_depth_tpu.train.checkpoint import load_quantized, save_quantized

    config = GelslimConfig(
        weights_name="qtrunc", CNN_dimensions=(4, 8),
        input_tactile_image_size=(16, 21),
        image_normalization_method="0_255_to_0_1",
        depth_normalization_method="min_max_to_0_-1",
        depth_normalization_parameters=(-1.9, 0.0), norm_scale=0.9,
    )
    params, stats = init_unet(jax.random.PRNGKey(8), config.unet_config())
    x = jnp.asarray(rng.uniform(0, 1, (2, 3, 16, 21)).astype(np.float32))
    q = quantize_unet(config.unet_config(), params, stats, x)
    save_quantized(str(tmp_path), config, q)
    path = tmp_path / "qtrunc_int8.npz"
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    dropped = [k for k in flat if k.startswith("w8/down_0/")]
    assert dropped
    for k in dropped:
        del flat[k], flat["w_scale/" + k[len("w8/"):]]
    np.savez(path, **flat)
    with pytest.raises(KeyError, match="w8/down_0"):
        load_quantized(str(tmp_path))

    # a file truncated between the w8 block and its scales must also fail
    # with the named diagnostic, not a bare KeyError from the scale lookup
    save_quantized(str(tmp_path), config, q)
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    some_scale = next(k for k in flat if k.startswith("w_scale/"))
    del flat[some_scale]
    np.savez(path, **flat)
    with pytest.raises(KeyError, match="truncated or corrupt"):
        load_quantized(str(tmp_path))

    # ... and one missing the activation-scale record entirely
    save_quantized(str(tmp_path), config, q)
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    del flat["act_scale_json"]
    np.savez(path, **flat)
    with pytest.raises(KeyError, match="act_scale_json"):
        load_quantized(str(tmp_path))


def test_recalibration_does_not_retrace(tiny_net, rng):
    """Activation scales are traced runtime data (round-4): quantizing
    again with different data of the same shapes must hit the existing
    jit cache of the serving apply, not recompile it. (Round 3 carried
    the scales in the pytree's static aux_data, so every recalibration
    retraced _apply_int8 and every jit built on it — minutes per shape
    through the tunneled compiler.)"""
    from gelslim_depth_tpu.models import quantize as qz

    cfg, params, stats = tiny_net
    calib1 = jnp.asarray(rng.uniform(0, 1, (4, 3, 32, 43)).astype(np.float32))
    calib2 = jnp.asarray(rng.uniform(0, 2, (4, 3, 32, 43)).astype(np.float32))
    q1 = quantize_unet(cfg, params, stats, calib1)
    unet_apply_int8(q1, calib1, compute_dtype=jnp.float32)
    n_after_first = qz._apply_int8._cache_size()
    q2 = quantize_unet(cfg, params, stats, calib2)
    y2 = unet_apply_int8(q2, calib2, compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(y2)).all()
    assert qz._apply_int8._cache_size() == n_after_first, (
        "recalibration retraced the int8 serving graph"
    )
    # the second calibration's scales are genuinely different runtime data
    assert any(float(q2.act_scale[k]) != float(q1.act_scale[k]) for k in q1.act_scale)
    # same treedef -> any jit taking a QuantizedUNet argument cache-hits
    assert (jax.tree_util.tree_structure(q1._asdict()["act_scale"])
            == jax.tree_util.tree_structure(q2._asdict()["act_scale"]))
    assert jax.tree_util.tree_structure((q1,)) == jax.tree_util.tree_structure((q2,))


def test_quantized_predictor_recalibrate_in_place(rng):
    """QuantizedPredictor.recalibrate swaps scales on the same weights
    without invalidating the predictor's compiled serving graphs."""
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
    pred = Predictor(config, params, stats)
    frames = jnp.asarray(rng.uniform(0, 255, (4, 6, 64, 86)).astype(np.float32))
    base = jnp.asarray(rng.uniform(0, 255, (6, 64, 86)).astype(np.float32))
    qpred = pred.quantize(frames, base)
    y_before = np.asarray(qpred.predict_dual_frames(frames[:2], base, (64, 86)))
    dual_jit = qpred._dual((64, 86))
    n_compiled = dual_jit._cache_size()

    frames2 = jnp.asarray(rng.uniform(0, 255, (4, 6, 64, 86)).astype(np.float32))
    out = qpred.recalibrate(frames2, base)
    assert out is qpred
    assert qpred.delta_mm < 0.05, qpred.delta_mm
    y_after = np.asarray(qpred.predict_dual_frames(frames[:2], base, (64, 86)))
    # the SAME compiled dual graph served the recalibrated model
    assert qpred._dual((64, 86)) is dual_jit
    assert dual_jit._cache_size() == n_compiled, "recalibrate recompiled serving"
    # recalibrated output stays within the float-parity budget
    y_f = np.asarray(pred.predict_dual_frames(frames[:2], base, (64, 86)))
    assert np.sqrt(np.mean((y_after - y_f) ** 2)) < 0.05
    assert np.isfinite(y_before).all() and np.isfinite(y_after).all()


def test_rowsplit_pack_exact(rng):
    """The row-split matmul formulation must equal the model's actual
    conv_transpose call (transpose_kernel=True, stored (k,k,cout,cin)
    layout, models/unet.py:261-272) to f32 rounding — the packing
    contract behind _upconv_int8."""
    from jax import lax

    from gelslim_depth_tpu.models.quantize import pack_upconv_rowsplit

    cin, cout = 16, 8
    x = jnp.asarray(rng.randn(2, 5, 7, cin).astype(np.float32))
    w = jnp.asarray((rng.randn(2, 2, cout, cin) * 0.1).astype(np.float32))
    ref = lax.conv_transpose(
        x, w, strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
        precision=lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
    )
    m = pack_upconv_rowsplit(w)
    parts = [
        jax.lax.dot_general(
            x, m[di], (((3,), (0,)), ((), ())), precision=lax.Precision.HIGHEST
        ).reshape(2, 5, 14, cout)
        for di in range(2)
    ]
    got = jnp.stack(parts, axis=2).reshape(2, 10, 14, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_int8_upconv_weight_quantization(rng):
    """quantize_upconv_weight: per-output-channel scales replicated per
    dj block; dequantized pack within half a step of the exact pack."""
    from gelslim_depth_tpu.models.quantize import (
        pack_upconv_rowsplit,
        quantize_upconv_weight,
    )

    w = jnp.asarray((rng.randn(2, 2, 8, 16) * 0.1).astype(np.float32))
    q, s_col = quantize_upconv_weight(w)
    assert q.dtype == jnp.int8 and q.shape == (2, 16, 16) and s_col.shape == (16,)
    np.testing.assert_array_equal(np.asarray(s_col[:8]), np.asarray(s_col[8:]))
    m = np.asarray(pack_upconv_rowsplit(w))
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s_col) - m)
    assert err.max() <= np.asarray(s_col).max() / 2 + 1e-7


def test_int8_upconvs_forward_close_to_float(tiny_net, rng):
    """quantize_upconvs=True: every transposed conv runs int8 row-split;
    output stays within the quantization budget of the float graph and
    the artifact carries the extra sites."""
    from gelslim_depth_tpu.models.quantize import _upconv_sites

    cfg, params, stats = tiny_net
    x = jnp.asarray(rng.uniform(0, 1, (4, 3, 32, 43)).astype(np.float32))
    q = quantize_unet(cfg, params, stats, x, quantize_upconvs=True)
    assert _upconv_sites(cfg) == ["up_0", "up_1"]
    for b in _upconv_sites(cfg):
        assert q.w8[b]["upconv"].dtype == jnp.int8
        assert f"{b}/upconv" in q.act_scale
    y_q = unet_apply_int8(q, x, compute_dtype=jnp.float32)
    y_f, _ = unet_apply(cfg, params, stats, x, train=False)
    spread = float(jnp.max(y_f) - jnp.min(y_f)) + 1e-6
    rmse = float(jnp.sqrt(jnp.mean((y_q - y_f) ** 2)))
    assert rmse < 0.05 * spread + 5e-3, rmse
    assert abs(float(q.float_delta) - rmse) < 1e-4 + 0.5 * rmse
    # the upconv path must actually differ from the float-upconv artifact
    q_base = quantize_unet(cfg, params, stats, x)
    assert "upconv" not in q_base.w8["up_0"]


def test_int8_upconvs_kernel_stride_mismatch_disabled(rng):
    """kernel_size=5 -> up_k=4 != stride 2: the row-split decomposition
    does not apply, so quantize_upconvs must silently no-op."""
    cfg = UNetConfig(layer_dimensions=(4, 8), kernel_size=5)
    params, stats = init_unet(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(rng.uniform(0, 1, (2, 3, 24, 33)).astype(np.float32))
    q = quantize_unet(cfg, params, stats, x, quantize_upconvs=True)
    assert "upconv" not in q.w8["up_0"]
    assert "up_0/upconv" not in q.act_scale
    assert np.isfinite(np.asarray(unet_apply_int8(q, x))).all()


def test_int8_upconvs_predictor_checkpoint_recalibrate(tmp_path, rng):
    """End-to-end with int8 upconvs: Predictor.quantize passthrough,
    mm accuracy, save/load bit-identity, and in-place recalibration
    (which must re-derive the upconv scales too, without recompiling)."""
    from gelslim_depth_tpu.inference import QuantizedPredictor

    config = GelslimConfig(
        weights_name="qup", CNN_dimensions=(4, 8),
        input_tactile_image_size=(16, 21),
        image_normalization_method="0_255_to_0_1",
        depth_normalization_method="min_max_to_0_-1",
        depth_normalization_parameters=(-1.9, 0.0), norm_scale=0.9,
        use_difference_image=True,
    )
    params, stats = init_unet(jax.random.PRNGKey(8), config.unet_config())
    pred = Predictor(config, params, stats, compute_dtype=jnp.float32)
    frames = jnp.asarray(rng.uniform(0, 255, (4, 6, 32, 43)).astype(np.float32))
    base = jnp.asarray(rng.uniform(0, 255, (6, 32, 43)).astype(np.float32))
    qpred = pred.quantize(frames, base, quantize_upconvs=True)
    assert "upconv" in qpred.q.w8["up_0"]
    assert qpred.delta_mm < 0.05, qpred.delta_mm
    y_q = np.asarray(qpred.predict_dual_frames(frames[:2], base, (32, 43)))
    y_f = np.asarray(pred.predict_dual_frames(frames[:2], base, (32, 43)))
    assert np.sqrt(np.mean((y_q - y_f) ** 2)) < 0.05

    qpred.save(str(tmp_path))
    loaded = QuantizedPredictor.from_checkpoint(str(tmp_path), compute_dtype=jnp.float32)
    assert "upconv" in loaded.q.w8["up_0"]
    np.testing.assert_array_equal(
        y_q, np.asarray(loaded.predict_dual_frames(frames[:2], base, (32, 43)))
    )

    dual_jit = qpred._dual((32, 43))
    n_compiled = dual_jit._cache_size()
    frames2 = jnp.asarray(rng.uniform(0, 255, (4, 6, 32, 43)).astype(np.float32))
    qpred.recalibrate(frames2, base)
    assert "up_0/upconv" in qpred.q.act_scale
    assert qpred._dual((32, 43)) is dual_jit
    assert dual_jit._cache_size() == n_compiled
    assert qpred.delta_mm < 0.05, qpred.delta_mm
