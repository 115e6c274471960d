"""End-to-end fused-inference parity vs the reference chain composed in
torch, plus config artifact round-trips.

The reference inference graph (test_depth_estimation.py:14-20):
resize(area, to input size) -> normalize image -> UNet -> denormalize
depth -> resize(area, to output size). Parity gate from BASELINE.json:
< 0.05 mm RMSE delta.
"""

import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from gelslim_depth_tpu.config import GelslimConfig
from gelslim_depth_tpu.inference import Predictor, StreamingEngine, predict_depth_from_RGB
from gelslim_depth_tpu.models.torch_import import import_torch_state_dict
from tests.torch_fixture import make_state_dict, torch_unet_forward

DIMS = (8, 16, 32)
DEPTH_RANGE = (-1.9180814027786255, 0.0)


def small_config():
    return GelslimConfig(
        CNN_dimensions=DIMS,
        input_tactile_image_size=(40, 53),
        depth_normalization_parameters=DEPTH_RANGE,
        image_normalization_method="0_255_to_0_1",
        depth_normalization_method="min_max_to_0_-1",
        norm_scale=0.9,
    )


def torch_reference_chain(sd, images_np, cfg: GelslimConfig, output_size):
    """The reference's 5-step chain, composed with torch primitives."""
    x = F.interpolate(torch.from_numpy(images_np), size=cfg.input_tactile_image_size, mode="area")
    x = (x / 255.0).numpy()  # 0_255_to_0_1
    y = torch_unet_forward(sd, x, DIMS)
    # denormalize min_max_to_0_-1: x*denom/scale + bias, scale=-0.9
    mn, mx = cfg.depth_normalization_parameters
    y = y * (mx - mn) / (-cfg.norm_scale) + mn
    return F.interpolate(torch.from_numpy(y), size=output_size, mode="area").numpy()


@pytest.fixture(scope="module")
def bundle():
    rng = np.random.RandomState(42)
    sd = make_state_dict(rng, DIMS)
    cfg = small_config()
    params, stats = import_torch_state_dict(sd, cfg.unet_config())
    return rng, sd, cfg, Predictor(cfg, params, stats)


def test_fused_predict_parity_mm(bundle):
    rng, sd, cfg, pred = bundle
    images = rng.uniform(0, 255, (2, 3, 80, 107)).astype(np.float32)
    out_size = (80, 107)
    got = np.asarray(pred.predict_depth_from_RGB(images, out_size))
    want = torch_reference_chain(sd, images, cfg, out_size)
    rmse = float(np.sqrt(np.mean((got - want) ** 2)))
    assert rmse < 0.05, f"mm RMSE delta {rmse} exceeds parity gate"
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_reference_signature_wrapper(bundle):
    rng, sd, cfg, pred = bundle
    images = rng.uniform(0, 255, (1, 3, 80, 107)).astype(np.float32)
    a = np.asarray(predict_depth_from_RGB(images, pred, (40, 53), cfg))
    b = np.asarray(pred.predict_depth_from_RGB(images, (40, 53)))
    np.testing.assert_array_equal(a, b)


def test_dual_frame_path(bundle):
    rng, sd, cfg, pred = bundle
    frames = rng.uniform(0, 255, (3, 6, 80, 107)).astype(np.float32)
    base = rng.uniform(0, 255, (6, 80, 107)).astype(np.float32)
    got = np.asarray(pred.predict_dual_frames(frames, base, (80, 107)))
    assert got.shape == (3, 2, 80, 107)
    # equals running each finger's difference image through the single path
    diffs = ((frames.reshape(3, 2, 3, 80, 107) - base.reshape(1, 2, 3, 80, 107)) + 255.0) / 2.0
    single = np.asarray(pred.predict_depth_from_RGB(diffs.reshape(6, 3, 80, 107), (80, 107)))
    np.testing.assert_allclose(got.reshape(6, 1, 80, 107), single, rtol=1e-5, atol=1e-5)


def test_streaming_engine(bundle):
    rng, sd, cfg, pred = bundle
    base = rng.uniform(0, 255, (6, 80, 107)).astype(np.float32)
    eng = StreamingEngine(pred, (80, 107), base_frame=base)
    frames = [rng.uniform(0, 255, (6, 80, 107)).astype(np.float32) for _ in range(4)]
    for f in frames:
        eng.submit(f)
    assert eng.pending == 4
    outs = eng.drain()
    assert len(outs) == 4 and outs[0].shape == (1, 2, 80, 107)
    want = np.asarray(pred.predict_dual_frames(frames[2][None], base, (80, 107)))
    np.testing.assert_allclose(outs[2], want, rtol=1e-6, atol=1e-6)


def test_streaming_engine_bounded_drop_oldest(bundle):
    """Default live-view policy: the queue never exceeds max_inflight; the
    oldest pending result is discarded (and counted) to admit a new frame,
    and FIFO order of the survivors holds."""
    rng, sd, cfg, pred = bundle
    base = rng.uniform(0, 255, (6, 80, 107)).astype(np.float32)
    eng = StreamingEngine(pred, (80, 107), base_frame=base, max_inflight=2)
    frames = [rng.uniform(0, 255, (6, 80, 107)).astype(np.float32) for _ in range(5)]
    for f in frames:
        assert eng.submit(f)  # always admitted under drop-oldest
    assert eng.pending == 2
    st = eng.stats()
    assert st["submitted"] == 5 and st["dropped"] == 3
    outs = eng.drain()
    # the two survivors are the NEWEST two, in order
    for got, f in zip(outs, frames[3:]):
        want = np.asarray(pred.predict_dual_frames(f[None], base, (80, 107)))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    st = eng.stats()
    assert st["completed"] == 2 and st["pending"] == 0
    assert st["mean_latency_ms"] > 0 and st["throughput_fps"] > 0


def test_streaming_engine_drop_newest_and_block(bundle):
    rng, sd, cfg, pred = bundle
    base = rng.uniform(0, 255, (6, 80, 107)).astype(np.float32)
    frames = [rng.uniform(0, 255, (6, 80, 107)).astype(np.float32) for _ in range(4)]

    eng = StreamingEngine(pred, (80, 107), base_frame=base, max_inflight=2,
                          drop_policy="newest")
    admitted = [eng.submit(f) for f in frames]
    assert admitted == [True, True, False, False]
    assert eng.pending == 2 and eng.stats()["dropped"] == 2
    # the survivors are the OLDEST two
    want = np.asarray(pred.predict_dual_frames(frames[0][None], base, (80, 107)))
    np.testing.assert_allclose(eng.get(), want, rtol=1e-6, atol=1e-6)

    eng = StreamingEngine(pred, (80, 107), base_frame=base, max_inflight=2,
                          drop_policy="block")
    for f in frames:
        assert eng.submit(f)  # backpressure, nothing dropped
    assert eng.stats()["dropped"] == 0
    outs = eng.drain()
    assert len(outs) == 4

    with pytest.raises(ValueError, match="drop_policy"):
        StreamingEngine(pred, (80, 107), drop_policy="nope")


def test_streaming_engine_base_refresh(bundle):
    """update_base takes effect for subsequent submissions (regrasp flow)."""
    rng, sd, cfg, pred = bundle
    base1 = rng.uniform(0, 255, (6, 80, 107)).astype(np.float32)
    base2 = rng.uniform(0, 255, (6, 80, 107)).astype(np.float32)
    frame = rng.uniform(0, 255, (6, 80, 107)).astype(np.float32)
    cfg_diff = small_config()
    cfg_diff.use_difference_image = True
    from gelslim_depth_tpu.models.torch_import import import_torch_state_dict as _imp

    params, stats = _imp(sd, cfg_diff.unet_config())
    pred_diff = Predictor(cfg_diff, params, stats)
    eng = StreamingEngine(pred_diff, (80, 107), base_frame=base1)
    eng.submit(frame)
    eng.update_base(base2)
    eng.submit(frame)
    a, b = eng.drain()
    assert not np.allclose(a, b)  # different base -> different diff image
    want = np.asarray(pred_diff.predict_dual_frames(frame[None], base2, (80, 107)))
    np.testing.assert_allclose(b, want, rtol=1e-6, atol=1e-6)


class _FakeResult:
    """Stand-in for a jax.Array whose readiness the test controls."""

    def __init__(self, arr, owner):
        self._arr = arr
        self._owner = owner

    def is_ready(self):
        return self._owner.device_idle

    def block_until_ready(self):
        self._owner.device_idle = True
        return self

    def __array__(self, dtype=None, copy=None):
        return np.asarray(self._arr, dtype=dtype)


class _FakePredictor:
    """Deterministic CPU double for the coalescing logic: each (1, 6, H, W)
    frame maps to a (2, h, w) output filled with the frame's first value, so
    FIFO order and micro-batch row routing are directly observable. The
    device-busy state is a flag the test flips, making the slot machinery
    (dispatch only when a slot frees) fully deterministic."""

    def __init__(self, output_size=(4, 5)):
        self.output_size = output_size
        self.device_idle = False
        self.dispatch_sizes = []
        self.dispatch_bases = []

    def predict_dual_frames_multi(self, frames_list, base_frame, output_size):
        self.dispatch_sizes.append(len(frames_list))
        self.dispatch_bases.append(
            None if base_frame is None else float(np.asarray(base_frame).flat[0])
        )
        out = np.stack(
            [np.full((2, *output_size), float(np.asarray(f).flat[0])) for f in frames_list]
        )
        return _FakeResult(out, self)


def _const_frame(v):
    return np.full((6, 8, 9), float(v), dtype=np.float32)


def test_streaming_engine_coalesces_while_device_busy():
    """VERDICT r4 item 1's CPU gate: frames submitted while the device is
    busy coalesce — fewer dispatches than frames, power-of-2 micro-batch
    sizes capped at `microbatch`, outputs correct and FIFO-ordered."""
    fake = _FakePredictor()
    eng = StreamingEngine(
        fake, fake.output_size, max_inflight=16, microbatch=4, max_dispatches=1
    )
    # device idle -> the first frame dispatches alone (zero added latency)
    eng.submit(_const_frame(0))
    assert fake.dispatch_sizes == [1]
    # device busy -> the next 8 frames queue on the host, no dispatches
    for i in range(1, 9):
        eng.submit(_const_frame(i))
    assert fake.dispatch_sizes == [1] and eng.pending == 9
    # slot frees -> ONE micro-batch of 4 (the cap), not 8 single dispatches
    fake.device_idle = True
    eng.submit(_const_frame(9))
    assert fake.dispatch_sizes == [1, 4]
    outs = eng.drain()  # flush dispatches the remaining 5 as 4 + 1
    assert fake.dispatch_sizes == [1, 4, 4, 1]
    assert [float(o.flat[0]) for o in outs] == list(range(10))  # FIFO
    st = eng.stats()
    assert st["dispatches"] == 4 and st["mean_dispatch_size"] == 2.5
    assert st["completed"] == 10 and st["dropped"] == 0


def test_streaming_engine_power_of_two_bucketing():
    """3 pending frames dispatch as 2 + 1 (power-of-2 bucketed program
    shapes), never as a 3-frame program."""
    fake = _FakePredictor()
    eng = StreamingEngine(
        fake, fake.output_size, max_inflight=16, microbatch=8, max_dispatches=1
    )
    eng.submit(_const_frame(0))
    for i in range(1, 4):
        eng.submit(_const_frame(i))
    fake.device_idle = True
    outs = eng.drain()
    assert fake.dispatch_sizes == [1, 2, 1]
    assert [float(o.flat[0]) for o in outs] == [0.0, 1.0, 2.0, 3.0]


def test_streaming_engine_queued_frames_keep_submission_base():
    """update_base flushes queued frames under the base they were
    submitted with; only later submissions see the new base."""
    fake = _FakePredictor()
    eng = StreamingEngine(
        fake, fake.output_size, base_frame=_const_frame(100),
        max_inflight=16, microbatch=4, max_dispatches=1,
    )
    eng.submit(_const_frame(0))      # dispatches under base 100
    eng.submit(_const_frame(1))      # queues (device busy)
    eng.update_base(_const_frame(200))  # flushes frame 1 under base 100
    fake.device_idle = True
    eng.submit(_const_frame(2))      # dispatches under base 200
    eng.drain()
    assert fake.dispatch_bases == [100.0, 100.0, 200.0]


def test_streaming_engine_block_mode_warns_on_undrained_results():
    """drop_policy='block' never drops, but an un-draining consumer grows
    the unclaimed-result queue — the engine warns once past results_warn."""
    import warnings

    fake = _FakePredictor()
    fake.device_idle = True
    eng = StreamingEngine(
        fake, fake.output_size, max_inflight=1, drop_policy="block",
        results_warn=2, max_dispatches=1,
    )
    with pytest.warns(RuntimeWarning, match="not draining"):
        for i in range(6):
            eng.submit(_const_frame(i))
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # warns only once
        eng.submit(_const_frame(6))
    assert eng.stats()["dropped"] == 0
    outs = eng.drain()
    assert [float(o.flat[0]) for o in outs] == list(range(7))


def test_predict_dual_frames_multi_matches_batched(bundle):
    """The micro-batch jit (k separate (1,6,H,W) args concatenated inside
    the program) must equal the plain batched dual graph for every bucket
    size the engine can emit."""
    rng2 = np.random.RandomState(7)
    _, _, cfg, pred = bundle
    base = rng2.uniform(0, 255, (6, 80, 107)).astype(np.float32)
    frames = [rng2.uniform(0, 255, (1, 6, 80, 107)).astype(np.float32) for _ in range(4)]
    for k in (1, 2, 4):
        got = np.asarray(pred.predict_dual_frames_multi(frames[:k], base, (80, 107)))
        want = np.asarray(
            pred.predict_dual_frames(np.concatenate(frames[:k], axis=0), base, (80, 107))
        )
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_streaming_engine_coalesced_outputs_match_real_predictor(bundle):
    """End-to-end with the REAL predictor: force coalescing (deep queue,
    one dispatch slot) and check every drained output equals the
    per-frame fused graph, in submission order."""
    rng2 = np.random.RandomState(11)
    _, _, cfg, pred = bundle
    base = rng2.uniform(0, 255, (6, 80, 107)).astype(np.float32)
    frames = [rng2.uniform(0, 255, (6, 80, 107)).astype(np.float32) for _ in range(7)]
    eng = StreamingEngine(
        pred, (80, 107), base_frame=base,
        max_inflight=8, microbatch=4, max_dispatches=1,
    )
    for f in frames:
        assert eng.submit(f)
    outs = eng.drain()
    st = eng.stats()
    assert st["completed"] == 7 and st["dropped"] == 0
    for got, f in zip(outs, frames):
        want = np.asarray(pred.predict_dual_frames(f[None], base, (80, 107)))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_config_python_roundtrip(tmp_path):
    cfg = small_config()
    cfg.train_objects = ["pattern_31_rod_train.pt"]
    p = str(tmp_path / "config_test.py")
    cfg.emit_python_config(p)
    cfg2 = GelslimConfig.from_python_module(p)
    assert cfg2.CNN_dimensions == tuple(DIMS)
    assert cfg2.depth_normalization_parameters == DEPTH_RANGE
    assert cfg2.train_objects == ["pattern_31_rod_train.pt"]
    assert cfg2.input_tactile_image_size == (40, 53)


def test_config_json_roundtrip(tmp_path):
    cfg = small_config()
    p = str(tmp_path / "config.json")
    cfg.save_json(p)
    cfg2 = GelslimConfig.from_json(p)
    assert cfg2 == cfg


def test_tactile_alias_bugfix():
    """The reference crashes reading config.tactile_normalization_method
    (complete_prediction.py:6); our config must alias both spellings."""
    cfg = small_config()
    assert cfg.tactile_normalization_method == cfg.image_normalization_method
    assert cfg.tactile_normalization_parameters == cfg.image_normalization_parameters


@pytest.mark.skipif(
    not os.path.exists("/root/reference/gelslim_depth/config/config_unet_bigdata.py"),
    reason="reference checkout not present",
)
def test_import_shipped_reference_config():
    cfg = GelslimConfig.from_python_module(
        "/root/reference/gelslim_depth/config/config_unet_bigdata.py"
    )
    assert cfg.CNN_dimensions == (64, 128, 256, 512, 1024)
    assert cfg.input_tactile_image_size == (160, 213)
    assert cfg.depth_normalization_parameters == (-1.9180814027786255, 0.0)
    assert cfg.norm_scale == 0.9
    assert cfg.image_normalization_method == "0_255_to_0_1"


def test_dual_frame_pallas_path(bundle):
    """use_pallas routes the front-end through the fused kernel
    (interpreter off-TPU) and must match the XLA-composed path."""
    rng, sd, cfg, pred = bundle
    from gelslim_depth_tpu.inference import fused_predict_dual

    frames = jnp.asarray(rng.uniform(0, 255, (2, 6, 80, 107)).astype(np.float32))
    base = jnp.asarray(rng.uniform(0, 255, (6, 80, 107)).astype(np.float32))
    a = np.asarray(
        fused_predict_dual(cfg, cfg.unet_config(), pred.params, pred.batch_stats,
                           frames, base, (80, 107), use_pallas=True)
    )
    b = np.asarray(pred.predict_dual_frames(frames, base, (80, 107)))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_predictor_from_torch_checkpoint(tmp_path, bundle):
    """The published-.pth ingestion path: torch state_dict file -> Predictor."""
    import torch

    rng, sd, cfg, pred = bundle
    p = str(tmp_path / "weights.pth")
    torch.save({k: torch.from_numpy(np.array(v)) for k, v in sd.items()}, p)
    pred2 = Predictor.from_torch_checkpoint(p, cfg)
    images = rng.uniform(0, 255, (1, 3, 80, 107)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(pred2.predict_depth_from_RGB(images, (40, 53))),
        np.asarray(pred.predict_depth_from_RGB(images, (40, 53))),
        rtol=1e-6, atol=1e-6,
    )


def test_dp_fused_predictor_matches_single(bundle):
    """Config-5 path: full dual-frame graph sharded over an 8-device mesh
    equals the single-device fused graph."""
    import jax

    from gelslim_depth_tpu.parallel import make_mesh, make_dp_fused_predictor, replicate, shard_batch

    rng, sd, cfg, pred = bundle
    mesh = make_mesh(8)
    dp = make_dp_fused_predictor(cfg, cfg.unet_config(), mesh, (80, 107))
    frames = jnp.asarray(rng.uniform(0, 255, (16, 6, 80, 107)).astype(np.float32))
    base = jnp.asarray(rng.uniform(0, 255, (6, 80, 107)).astype(np.float32))
    got = dp(
        replicate(mesh, pred.params), replicate(mesh, pred.batch_stats),
        shard_batch(mesh, frames), replicate(mesh, base),
    )
    assert len(got.sharding.device_set) == 8
    want = pred.predict_dual_frames(frames, base, (80, 107))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_dp_fused_predictor_pallas_matches_single(bundle):
    """VERDICT r4 item 3: the Pallas fused preprocess under the DP graph
    via shard_map manual partitioning (pallas_call has no GSPMD rule) must
    equal both the unsharded graph and the GSPMD/XLA-front-end DP graph."""
    from gelslim_depth_tpu.parallel import make_mesh, make_dp_fused_predictor, replicate, shard_batch

    rng, sd, cfg, pred = bundle
    cfg_diff = small_config()
    cfg_diff.use_difference_image = True
    params, stats = import_torch_state_dict(sd, cfg_diff.unet_config())
    pred_diff = Predictor(cfg_diff, params, stats)
    mesh = make_mesh(8)
    dp_pallas = make_dp_fused_predictor(cfg_diff, cfg_diff.unet_config(), mesh, (80, 107),
                                        use_pallas=True)
    dp_xla = make_dp_fused_predictor(cfg_diff, cfg_diff.unet_config(), mesh, (80, 107),
                                     use_pallas=False)
    frames = jnp.asarray(np.random.RandomState(21).uniform(0, 255, (16, 6, 80, 107)).astype(np.float32))
    base = jnp.asarray(np.random.RandomState(22).uniform(0, 255, (6, 80, 107)).astype(np.float32))
    args = (replicate(mesh, params), replicate(mesh, stats),
            shard_batch(mesh, frames), replicate(mesh, base))
    got = dp_pallas(*args)
    assert len(got.sharding.device_set) == 8
    want = pred_diff.predict_dual_frames(frames, base, (80, 107))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(dp_xla(*args)), rtol=1e-5, atol=1e-5)


def test_dp_fused_predictor_int8_pallas_matches_single(bundle):
    """Int8 analog of the shard_mapped Pallas front-end."""
    from gelslim_depth_tpu.parallel import make_mesh, make_dp_fused_predictor_int8, replicate, shard_batch

    rng, sd, cfg, pred = bundle
    cfg_diff = small_config()
    cfg_diff.use_difference_image = True
    params, stats = import_torch_state_dict(sd, cfg_diff.unet_config())
    pred_diff = Predictor(cfg_diff, params, stats)
    frames = jnp.asarray(np.random.RandomState(23).uniform(0, 255, (16, 6, 80, 107)).astype(np.float32))
    base = jnp.asarray(np.random.RandomState(24).uniform(0, 255, (6, 80, 107)).astype(np.float32))
    qpred = pred_diff.quantize(frames[:4], base)
    mesh = make_mesh(8)
    dq = make_dp_fused_predictor_int8(cfg_diff, qpred.q, mesh, (80, 107),
                                      compute_dtype=jnp.float32, use_pallas=True)
    got = dq(replicate(mesh, qpred.q), shard_batch(mesh, frames), replicate(mesh, base))
    assert len(got.sharding.device_set) == 8
    want = qpred.predict_dual_frames(frames, base, (80, 107))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_dp_fused_predictor_pallas_fallback_batched_base(bundle):
    """A batched per-frame base (N, 6, H, W) is outside the kernel's
    contract — the use_pallas=True DP graph must fall back to the GSPMD/XLA
    front-end at trace time and still be correct."""
    from gelslim_depth_tpu.parallel import make_mesh, make_dp_fused_predictor, replicate, shard_batch

    rng, sd, cfg, pred = bundle
    cfg_diff = small_config()
    cfg_diff.use_difference_image = True
    params, stats = import_torch_state_dict(sd, cfg_diff.unet_config())
    pred_diff = Predictor(cfg_diff, params, stats)
    mesh = make_mesh(8)
    dp = make_dp_fused_predictor(cfg_diff, cfg_diff.unet_config(), mesh, (80, 107),
                                 use_pallas=True)
    frames = jnp.asarray(np.random.RandomState(25).uniform(0, 255, (8, 6, 80, 107)).astype(np.float32))
    bases = jnp.asarray(np.random.RandomState(26).uniform(0, 255, (8, 6, 80, 107)).astype(np.float32))
    got = dp(replicate(mesh, params), replicate(mesh, stats),
             shard_batch(mesh, frames), replicate(mesh, bases))
    want = pred_diff.predict_dual_frames(frames, bases, (80, 107))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_spatial_predictor_matches_single(bundle):
    """Height-axis (spatial) sharding — the single-frame LATENCY scaling
    mode — must produce the unsharded graph's output: GSPMD's derived halo
    exchanges have to be semantically invisible through every conv, pool,
    resize contraction, and the skip-concat pad logic."""
    import jax

    from gelslim_depth_tpu.parallel import make_mesh, make_spatial_predictor, replicate
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng, sd, cfg, pred = bundle
    mesh = make_mesh(8)
    predict = make_spatial_predictor(cfg, cfg.unet_config(), mesh, (80, 107))

    frames = jnp.asarray(
        np.random.RandomState(77).uniform(0, 255, (1, 6, 80, 107)).astype(np.float32)
    )
    base = jnp.asarray(
        np.random.RandomState(78).uniform(0, 255, (6, 80, 107)).astype(np.float32)
    )
    fr_sh = jax.device_put(frames, NamedSharding(mesh, P(None, None, "data", None)))
    base_sh = jax.device_put(base, NamedSharding(mesh, P(None, "data", None)))
    got = predict(
        replicate(mesh, pred.params), replicate(mesh, pred.batch_stats), fr_sh, base_sh
    )
    assert len(got.sharding.device_set) == 8  # output stays height-sharded
    want = pred.predict_dual_frames(frames, base, (80, 107))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_spatial_predictor_int8_matches_single(bundle):
    """The int8 analog (make_spatial_predictor_int8): GSPMD halo
    exchanges through the s8xs8->s32 convs must be semantically invisible
    too — completing the {batch, height} x {float, int8} sharding matrix."""
    import jax

    from gelslim_depth_tpu.parallel import make_mesh, make_spatial_predictor_int8, replicate
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng, sd, cfg, pred = bundle
    mesh = make_mesh(8)

    frames = jnp.asarray(
        np.random.RandomState(79).uniform(0, 255, (1, 6, 80, 107)).astype(np.float32)
    )
    base = jnp.asarray(
        np.random.RandomState(80).uniform(0, 255, (6, 80, 107)).astype(np.float32)
    )
    qpred = pred.quantize(
        jnp.asarray(np.random.RandomState(81).uniform(0, 255, (4, 6, 80, 107)).astype(np.float32)),
        base,
    )
    predict = make_spatial_predictor_int8(
        cfg, qpred.q, mesh, (80, 107), compute_dtype=jnp.float32
    )
    fr_sh = jax.device_put(frames, NamedSharding(mesh, P(None, None, "data", None)))
    base_sh = jax.device_put(base, NamedSharding(mesh, P(None, "data", None)))
    got = predict(replicate(mesh, qpred.q), fr_sh, base_sh)
    assert len(got.sharding.device_set) == 8
    want = qpred.predict_dual_frames(frames, base, (80, 107))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_pallas_auto_disabled_for_non_area_interp(rng):
    """The Pallas front-end hard-wires the area resize; a config with
    interp_method='bilinear' must take the XLA path that honors it even
    when use_pallas=True is requested."""
    import jax

    from gelslim_depth_tpu.inference import fused_predict_dual
    from gelslim_depth_tpu.models.unet import init_unet

    config = GelslimConfig(
        CNN_dimensions=(4, 8), input_tactile_image_size=(16, 21),
        image_normalization_method="0_255_to_0_1",
        depth_normalization_method="min_max_to_0_-1",
        depth_normalization_parameters=(-1.9, 0.0), norm_scale=0.9,
        use_difference_image=True, interp_method="bilinear",
    )
    params, stats = init_unet(jax.random.PRNGKey(0), config.unet_config())
    frames = jnp.asarray(rng.uniform(0, 255, (2, 6, 32, 43)).astype(np.float32))
    base = jnp.asarray(rng.uniform(0, 255, (6, 32, 43)).astype(np.float32))
    y_p = fused_predict_dual(config, config.unet_config(), params, stats,
                             frames, base, (32, 43), use_pallas=True)
    y_x = fused_predict_dual(config, config.unet_config(), params, stats,
                             frames, base, (32, 43), use_pallas=False)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), rtol=1e-6)
