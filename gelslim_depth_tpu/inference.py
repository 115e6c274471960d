"""Fused inference: the deployable RGB -> mm-depth graph, one XLA program.

The reference's inference chain is resize -> normalize -> UNet ->
denormalize -> resize-back, spread across five Python calls
(ref test_utils/test_depth_estimation.py:14-20, processing_utils/
complete_prediction.py:4-10). Here the whole chain — optionally including
dual-finger base-image subtraction — is traced into a single jit so XLA
fuses the preprocessing affines into the first conv's input pipeline and
the denorm/resize into the last conv's epilogue.

Note: the reference's shipped `predict_depth_from_RGB` crashes on the
generated configs (reads `config.tactile_normalization_*`, configs define
`image_normalization_*`; ref complete_prediction.py:6). This rebuild exposes
one correct function (GelslimConfig aliases both attribute spellings).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from gelslim_depth_tpu import ops
from gelslim_depth_tpu.config import GelslimConfig
from gelslim_depth_tpu.models.unet import UNetConfig, unet_apply


def fused_predict(
    config: GelslimConfig,
    unet_cfg: UNetConfig,
    params,
    batch_stats,
    images: jnp.ndarray,
    output_size: Tuple[int, int],
    *,
    compute_dtype=jnp.float32,
    net_fn: Optional[Callable] = None,
) -> jnp.ndarray:
    """resize -> normalize -> UNet(eval) -> denormalize -> resize-back.

    images: (N, 3, H, W) tactile (or difference) images in [0, 255].
    Returns (N, 1, *output_size) depth in mm (<= 0). Pure/traceable.
    net_fn overrides the network call (x_nchw -> y_nchw), e.g. the int8
    quantized forward.
    """
    x = ops.resize(images, config.input_tactile_image_size, config.interp_method)
    x = ops.normalize_tactile_image(
        x, config.image_normalization_method, config.norm_scale, config.image_normalization_parameters
    )
    if net_fn is None:
        y, _ = unet_apply(unet_cfg, params, batch_stats, x, train=False, compute_dtype=compute_dtype)
    else:
        y = net_fn(x)
    y = ops.denormalize_depth_image(
        y, config.depth_normalization_method, config.norm_scale, config.depth_normalization_parameters
    )
    return ops.resize(y, output_size, config.interp_method)


def dual_frames_to_fingers(
    config: GelslimConfig, frames: jnp.ndarray, base_frame: Optional[jnp.ndarray]
) -> jnp.ndarray:
    """(N, 6, H, W) dual frames -> (2N, 3, H, W) per-finger images after the
    configured difference-image step (rows interleave frame-left/frame-right).
    This IS the XLA serving front-end's first stage; calibration routes
    through it so the calibration input distribution matches serving
    (including interp_method downstream and batched (N, 6, H, W) bases)."""
    n = frames.shape[0]
    fingers = frames.reshape(n, 2, 3, *frames.shape[-2:]).reshape(2 * n, 3, *frames.shape[-2:])
    if config.use_difference_image and base_frame is not None:
        base = jnp.broadcast_to(base_frame, frames.shape) if base_frame.ndim == 3 else base_frame
        base = base.reshape(n, 2, 3, *frames.shape[-2:]).reshape(2 * n, 3, *frames.shape[-2:])
        fingers = ops.get_difference_image(fingers, base)
    return fingers


def fused_predict_dual(
    config: GelslimConfig,
    unet_cfg: UNetConfig,
    params,
    batch_stats,
    frames: jnp.ndarray,
    base_frame: Optional[jnp.ndarray],
    output_size: Tuple[int, int],
    *,
    compute_dtype=jnp.float32,
    use_pallas: Optional[bool] = None,
    net_fn: Optional[Callable] = None,
) -> jnp.ndarray:
    """Full dual-GelSlim frame path: (N, 6, H, W) raw frames (left 0:3,
    right 3:6) -> per-finger difference vs base_frame (6, H, W) or (N, 6,
    H, W) -> both fingers batched through the network -> (N, 2, *output_size)
    mm depth. This is BASELINE.json config 2's "fused preprocessing +
    inference" graph as one jit.

    use_pallas routes the diff+resize+normalize front-end through the
    single-VMEM-pass Pallas kernel (~3x the XLA-composed front-end
    standalone; measured end-to-end on v5e: 919 vs 783 frames/s at batch 1,
    1488 vs 1475 at batch 64 — the XLA front-end is only partially
    overlapped with the U-Net). Default None auto-enables it on TPU; its
    compiled Mosaic output is bit-identical to the XLA path (within 1 ULP
    at the kernel, 0.0 mm end-to-end under bf16 — tests/test_pallas_
    preprocess.py::test_compiled_mosaic_smoke). Requires a (6, H, W)
    shared base frame; batched per-frame bases fall back to XLA."""
    n = frames.shape[0]
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    # the kernel hard-wires the area resize; any other configured
    # interp_method must take the XLA path that honors it
    use_pallas = use_pallas and config.interp_method == "area"
    if use_pallas and (base_frame is None or base_frame.ndim == 3):
        from gelslim_depth_tpu.ops.normalize import image_norm_coeffs
        from gelslim_depth_tpu.ops.pallas import fused_preprocess_dual

        scale, bias, denom = image_norm_coeffs(
            config.image_normalization_method, config.norm_scale,
            config.image_normalization_parameters, 3,
        )
        mult = (scale / denom).astype(np.float32)
        add = (-bias * scale / denom).astype(np.float32)
        base = base_frame if base_frame is not None else jnp.zeros_like(frames[0])
        x = fused_preprocess_dual(
            frames, base, mult, add,
            out_size=config.input_tactile_image_size,
            use_diff=bool(config.use_difference_image and base_frame is not None),
        )
        if net_fn is None:
            y, _ = unet_apply(unet_cfg, params, batch_stats, x, train=False, compute_dtype=compute_dtype)
        else:
            y = net_fn(x)
        y = ops.denormalize_depth_image(
            y, config.depth_normalization_method, config.norm_scale,
            config.depth_normalization_parameters,
        )
        depth = ops.resize(y, output_size, config.interp_method)
        # pallas layout: rows [0, n) = left finger, [n, 2n) = right
        return jnp.stack([depth[:n, 0], depth[n:, 0]], axis=1)
    fingers = dual_frames_to_fingers(config, frames, base_frame)
    depth = fused_predict(
        config, unet_cfg, params, batch_stats, fingers, output_size,
        compute_dtype=compute_dtype, net_fn=net_fn,
    )
    return depth.reshape(n, 2, *output_size)


class Predictor:
    """Bundles config + weights into jitted single-finger and dual-frame
    predictors with per-output-size compilation caching.

    The reference's external-API contract (README.md:130-178): build model
    from a config module, load weights, call predict_depth_from_RGB.
    Equivalent here:

        cfg = GelslimConfig.from_python_module('...config_unet_bigdata')
        pred = Predictor.from_torch_checkpoint('unet_bigdata.pth', cfg)
        depth_mm = pred.predict_depth_from_RGB(diff_images, (320, 427))
    """

    def __init__(self, config: GelslimConfig, params, batch_stats, *, compute_dtype=jnp.float32):
        self.config = config
        self.unet_cfg = config.unet_config()
        self.params = params
        self.batch_stats = batch_stats
        self.compute_dtype = compute_dtype
        self._single = functools.cache(self._make_single)
        self._dual = functools.cache(self._make_dual)
        self._dual_multi = functools.cache(lambda key: self._make_dual_multi(*key))

    @classmethod
    def from_torch_checkpoint(cls, path: str, config: GelslimConfig, **kw) -> "Predictor":
        from gelslim_depth_tpu.models.torch_import import load_torch_checkpoint

        params, stats = load_torch_checkpoint(path, config.unet_config())
        return cls(config, params, stats, **kw)

    @classmethod
    def from_checkpoint(cls, ckpt_dir: str, **kw) -> "Predictor":
        from gelslim_depth_tpu.train.checkpoint import load_checkpoint

        config, params, stats = load_checkpoint(ckpt_dir)
        return cls(config, params, stats, **kw)

    def _make_single(self, output_size: Tuple[int, int]):
        fn = functools.partial(
            fused_predict, self.config, self.unet_cfg, compute_dtype=self.compute_dtype
        )
        return jax.jit(lambda p, s, im: fn(p, s, im, output_size=output_size))

    def _make_dual(self, output_size: Tuple[int, int]):
        fn = functools.partial(
            fused_predict_dual, self.config, self.unet_cfg, compute_dtype=self.compute_dtype
        )
        return jax.jit(lambda p, s, im, base: fn(p, s, im, base, output_size=output_size))

    def _make_dual_multi(self, output_size: Tuple[int, int], k: int):
        # k-frame micro-batch graph taking the frames as k SEPARATE (1, 6,
        # H, W) args and concatenating INSIDE the jit: the StreamingEngine's
        # coalesced dispatch is then exactly one program call (an eager
        # device-side concatenate costs ~a full dispatch round-trip on
        # tunneled runtimes, and a host-side stack would force device
        # frames back through the host)
        fn = functools.partial(
            fused_predict_dual, self.config, self.unet_cfg, compute_dtype=self.compute_dtype
        )
        return jax.jit(
            lambda p, s, fr, base: fn(
                p, s, jnp.concatenate(fr, axis=0) if k > 1 else fr[0],
                base, output_size=output_size,
            )
        )

    def predict_depth_from_RGB(self, images, output_size: Tuple[int, int]) -> jnp.ndarray:
        """(N, 3, H, W) [0,255] images -> (N, 1, *output_size) mm depth."""
        return self._single(tuple(output_size))(self.params, self.batch_stats, jnp.asarray(images))

    def predict_dual_frames(self, frames, base_frame, output_size: Tuple[int, int]) -> jnp.ndarray:
        """(N, 6, H, W) dual frames (+ base) -> (N, 2, *output_size) mm depth."""
        base = None if base_frame is None else jnp.asarray(base_frame)
        return self._dual(tuple(output_size))(
            self.params, self.batch_stats, jnp.asarray(frames), base
        )

    def predict_dual_frames_multi(self, frames_list, base_frame, output_size) -> jnp.ndarray:
        """Micro-batch entry: a list/tuple of k (1, 6, H, W) frames ->
        (k, 2, *output_size), concatenated inside one jitted program (the
        StreamingEngine's coalesced-dispatch path)."""
        base = None if base_frame is None else jnp.asarray(base_frame)
        fr = tuple(jnp.asarray(f) for f in frames_list)
        return self._dual_multi((tuple(output_size), len(fr)))(
            self.params, self.batch_stats, fr, base
        )

    def quantize(
        self, calib_frames, base_frame=None, *,
        percentile: float = 100.0, quantize_upconvs: bool = False,
    ) -> "QuantizedPredictor":
        """Post-training int8 quantization calibrated on representative
        raw dual frames (N, 6, H, W). Returns a drop-in predictor running
        the s8xs8->s32 MXU path (~1.5x the bf16 U-Net on v5e, see
        models/quantize.py). percentile < 100 clips activation-scale
        outliers. quantize_upconvs also runs the transposed convs in int8
        via the row-split matmul formulation. Check .delta_mm — the output
        deviation vs the float graph on the calibration batch — before
        deploying."""
        from gelslim_depth_tpu.models.quantize import quantize_unet

        cfg = self.config
        x = _calibration_inputs(cfg, calib_frames, base_frame)
        q = quantize_unet(
            self.unet_cfg, self.params, self.batch_stats, x,
            percentile=percentile, quantize_upconvs=quantize_upconvs,
        )
        return QuantizedPredictor(cfg, q, compute_dtype=self.compute_dtype)

    __call__ = predict_depth_from_RGB


def _calibration_inputs(cfg: GelslimConfig, calib_frames, base_frame=None):
    """Calibration preprocessing == serving preprocessing: the same
    diff/resize/normalize chain fused_predict(_dual) traces, honoring
    config.interp_method and batched (N, 6, H, W) base frames (the Pallas
    kernel computes bit-identical values for the area case, so this path
    calibrates both front-ends)."""
    frames = jnp.asarray(calib_frames)
    base = None if base_frame is None else jnp.asarray(base_frame)
    fingers = dual_frames_to_fingers(cfg, frames, base)
    x = ops.resize(fingers, cfg.input_tactile_image_size, cfg.interp_method)
    return ops.normalize_tactile_image(
        x, cfg.image_normalization_method, cfg.norm_scale, cfg.image_normalization_parameters
    )


class QuantizedPredictor:
    """Predictor running the int8-quantized U-Net (models/quantize.py)
    inside the same fused pre/post-processing graph. Same predict API as
    Predictor. Build via Predictor.quantize(calib_frames)."""

    def __init__(self, config: GelslimConfig, q, *, compute_dtype=jnp.bfloat16):
        from gelslim_depth_tpu.models.quantize import unet_apply_int8

        self.config = config
        self.q = q
        self.compute_dtype = compute_dtype
        self._apply_int8 = unet_apply_int8
        self._single = functools.cache(self._make_single)
        self._dual = functools.cache(self._make_dual)
        self._dual_multi = functools.cache(lambda key: self._make_dual_multi(*key))

    @property
    def delta_mm(self) -> float:
        """Calibration-batch output RMSE vs the float graph, in mm.

        The network output is in normalized-depth units; the mm factor is
        the denormalization slope of the configured depth method
        (ref normalization_utils.py:101-130): (max-min)/norm_scale for the
        min_max methods, std for mean_std."""
        cfg = self.config
        p = cfg.depth_normalization_parameters
        if p is None:
            raise ValueError(
                "delta_mm needs config.depth_normalization_parameters "
                "(the frozen training statistics) to convert to mm"
            )
        if cfg.depth_normalization_method == "mean_std":
            factor = float(p[3])
        else:
            factor = abs(float(p[1]) - float(p[0])) / cfg.norm_scale
        return float(self.q.float_delta) * factor

    def save(self, ckpt_dir: str, name: str = None) -> str:
        """Persist the quantized model so serving skips re-calibration."""
        from gelslim_depth_tpu.train.checkpoint import save_quantized

        return save_quantized(ckpt_dir, self.config, self.q, name=name)

    @classmethod
    def from_checkpoint(cls, ckpt_dir: str, name: str = None, **kw) -> "QuantizedPredictor":
        from gelslim_depth_tpu.train.checkpoint import load_quantized

        config, q = load_quantized(ckpt_dir, name)
        return cls(config, q, **kw)

    def recalibrate(self, calib_frames, base_frame=None, *, percentile: float = 100.0) -> "QuantizedPredictor":
        """Re-derive the activation scales from new representative frames
        on the SAME int8 weights, in place. Because the whole QuantizedUNet
        — activation scales included — passes through jit as runtime data,
        this swaps the scales without invalidating any compiled serving
        graph (tests/test_quantize.py::test_recalibration_does_not_retrace).
        Check .delta_mm afterwards. Returns self for chaining."""
        from gelslim_depth_tpu.models.quantize import calibrate_act_scales, unet_apply_int8
        from gelslim_depth_tpu.models.unet import unet_apply

        q = self.q
        x = _calibration_inputs(self.config, calib_frames, base_frame)
        has_upconvs = any("upconv" in v for v in q.w8.values())
        scales = calibrate_act_scales(
            q.cfg, q.params, q.batch_stats, x, percentile=percentile,
            quantize_upconvs=has_upconvs,
        )
        q = q._replace(act_scale={k: jnp.float32(v) for k, v in scales.items()})
        y_q = unet_apply_int8(q, x)
        y_f, _ = unet_apply(
            q.cfg, q.params, q.batch_stats, x, train=False, compute_dtype=jnp.float32
        )
        self.q = q._replace(float_delta=jnp.sqrt(jnp.mean(jnp.square(y_q - y_f))))
        return self

    def _make_single(self, output_size: Tuple[int, int]):
        cfg, dtype, apply = self.config, self.compute_dtype, self._apply_int8
        # the whole q — int8 weights AND activation scales — passes through
        # jit as a pytree argument: runtime buffers, not baked-in constants,
        # so recalibration swaps values without retracing
        return jax.jit(
            lambda q, frames: fused_predict(
                cfg, q.cfg, q.params, q.batch_stats, frames, output_size,
                compute_dtype=dtype,
                net_fn=lambda x: apply(q, x, compute_dtype=dtype),
            )
        )

    def _make_dual(self, output_size: Tuple[int, int]):
        cfg, dtype, apply = self.config, self.compute_dtype, self._apply_int8
        return jax.jit(
            lambda q, frames, base: fused_predict_dual(
                cfg, q.cfg, q.params, q.batch_stats, frames, base, output_size,
                compute_dtype=dtype,
                net_fn=lambda x: apply(q, x, compute_dtype=dtype),
            )
        )

    def _make_dual_multi(self, output_size: Tuple[int, int], k: int):
        # see Predictor._make_dual_multi: one jitted program per micro-batch
        # size, frames concatenated inside the jit
        cfg, dtype, apply = self.config, self.compute_dtype, self._apply_int8
        return jax.jit(
            lambda q, fr, base: fused_predict_dual(
                cfg, q.cfg, q.params, q.batch_stats,
                jnp.concatenate(fr, axis=0) if k > 1 else fr[0],
                base, output_size, compute_dtype=dtype,
                net_fn=lambda x: apply(q, x, compute_dtype=dtype),
            )
        )

    def predict_depth_from_RGB(self, images, output_size: Tuple[int, int]) -> jnp.ndarray:
        return self._single(tuple(output_size))(self.q, jnp.asarray(images))

    def predict_dual_frames(self, frames, base_frame, output_size: Tuple[int, int]) -> jnp.ndarray:
        base = None if base_frame is None else jnp.asarray(base_frame)
        return self._dual(tuple(output_size))(self.q, jnp.asarray(frames), base)

    def predict_dual_frames_multi(self, frames_list, base_frame, output_size) -> jnp.ndarray:
        base = None if base_frame is None else jnp.asarray(base_frame)
        fr = tuple(jnp.asarray(f) for f in frames_list)
        return self._dual_multi((tuple(output_size), len(fr)))(self.q, fr, base)

    __call__ = predict_depth_from_RGB


def predict_depth_from_RGB(images, model: Predictor, output_size, config: GelslimConfig = None):
    """Reference-signature convenience wrapper
    (ref complete_prediction.py:4 — with the attribute-name bug fixed)."""
    return model.predict_depth_from_RGB(images, output_size)


class _Dispatch:
    """One device program call covering k queued frames."""

    __slots__ = ("out", "k", "realized", "t_done")

    def __init__(self, out, k):
        self.out = out          # (k, 2, h, w) device array; None once realized
        self.k = k
        self.realized = None    # np.ndarray once read back
        self.t_done = None      # wall time of realization


class StreamingEngine:
    """Video-rate streaming harness for dual-GelSlim frames, with
    ADAPTIVE MICRO-BATCHING: frames that arrive while the device is busy
    coalesce into one dispatch.

    submit(frame) enqueues and returns immediately; results come back with
    get()/drain() in FIFO order (BASELINE.json config 5's streaming half).
    Dispatch policy: at most `max_dispatches` device calls are outstanding
    at once (slots are freed by non-blocking completion checks —
    jax.Array.is_ready — or by the consumer realizing results). When the
    device is idle a lone frame dispatches immediately (zero added
    latency); when all slots are busy, arriving frames queue on the host
    and the next free slot dispatches them TOGETHER as one micro-batch of
    up to `microbatch` frames (power-of-2 bucketed, so at most
    log2(microbatch)+1 program shapes ever compile). Each micro-batch is
    ONE jitted program — the frames concatenate inside the jit
    (predict_dual_frames_multi), so a coalesced dispatch costs the same
    host/scheduler round-trip as a single-frame one.

    Why: the chip's single-frame latency prices the int8 graph just under
    the 1,000 dual frames/s north star (~1.05 ms/frame), but 2- and
    4-frame dispatches cost only ~1.9/2.3 ms (docs/PERFORMANCE.md
    "Batch-1 latency decomposition") — so a single-frame-arrival feed
    that outruns the chip sustains the micro-batch service rate
    (>=1,400 f/s at cap 4), not the batch-1 rate, with the engine doing
    the batching itself (bench field `streaming_engine_fps`).

    Queue semantics on the FIFO of unclaimed frames:
    - Bounded depth (max_inflight, counted in FRAMES): a sensor outrunning
      the chip cannot grow host/device queues without bound.
    - Drop policy when the queue is full at submit:
        'oldest' (default): discard the oldest unclaimed frame and admit
          the new one — the live-view behavior (latency stays bounded, the
          consumer always sees the freshest depth). If the dropped frame
          was already dispatched its device work is not cancelled (async
          dispatch has no cancellation), only its result is discarded; a
          dropped frame that had NOT yet been dispatched costs nothing.
        'newest': refuse the new frame (submit returns False) — the
          lossless-logging behavior for a consumer that prefers gaps at
          the input over gaps in the record.
        'block': wait for the oldest outstanding dispatch's DEVICE work to
          finish, then admit — bounding in-flight device compute (the
          scarce resource) while the unclaimed-result queue grows until
          the consumer get()/drain()s; nothing is ever dropped. If the
          consumer never drains, the queue grows without bound — the
          engine warns (once) past `results_warn` unclaimed frames.
    - update_base(frame): swap the reference (no-contact) base frame
      between submissions, e.g. after a regrasp. Queued-but-undispatched
      frames are flushed with the OLD base first (a frame is always
      processed against the base that was current when it was submitted).
    - flush(): dispatch everything queued without waiting for free slots.
    - stats(): throughput/latency/dispatch-size self-report.

    Note on tunneled dev terminals: per-frame H2D of raw host frames is
    bounded by the ~50 MB/s tunnel, not this engine or the chip
    (docs/PERFORMANCE.md); on real TPU-VM PCIe the engine pipelines at
    the chip's micro-batch service rate. Deeper `max_dispatches` hides
    per-dispatch scheduler latency (the tunneled terminal needs ~8 to
    amortize its ~3 ms/dispatch round-trip; PCIe needs 2)."""

    def __init__(
        self,
        predictor: Predictor,
        output_size: Tuple[int, int],
        base_frame=None,
        *,
        max_inflight: int = 4,
        drop_policy: str = "oldest",
        microbatch: int = 4,
        max_dispatches: int = 2,
        results_warn: int = 64,
    ):
        if drop_policy not in ("oldest", "newest", "block"):
            raise ValueError(f"drop_policy {drop_policy!r}: want oldest|newest|block")
        if max_inflight < 1:
            raise ValueError("max_inflight must be >= 1")
        if microbatch < 1:
            raise ValueError("microbatch must be >= 1")
        if max_dispatches < 1:
            raise ValueError("max_dispatches must be >= 1")
        self.predictor = predictor
        self.output_size = tuple(output_size)
        self.base_frame = None if base_frame is None else jnp.asarray(base_frame)
        self.max_inflight = int(max_inflight)
        self.drop_policy = drop_policy
        self.microbatch = int(microbatch)
        self.max_dispatches = int(max_dispatches)
        self.results_warn = int(results_warn)
        # FIFO of unclaimed frames: [frame|None, _Dispatch|None, row, t_submit]
        self._queue = []
        self._outstanding = []  # dispatches whose device work may still run
        self._warned = False
        self._submitted = 0
        self._dropped = 0
        self._completed = 0
        self._n_dispatches = 0
        self._frames_dispatched = 0
        self._latency_sum = 0.0
        self._first_submit_time = None
        self._last_complete_time = None

    # -- dispatch machinery ------------------------------------------------
    def _pending_items(self):
        return [it for it in self._queue if it[1] is None]

    def _dispatch(self, items) -> None:
        frames = [it[0] for it in items]
        out = self.predictor.predict_dual_frames_multi(
            frames, self.base_frame, self.output_size
        )
        d = _Dispatch(out, len(items))
        for row, it in enumerate(items):
            it[0] = None
            it[1] = d
            it[2] = row
        self._outstanding.append(d)
        self._n_dispatches += 1
        self._frames_dispatched += len(items)

    def _pump(self) -> None:
        # free slots held by dispatches whose device work finished
        # (in-order on a single-stream device; is_ready is a non-blocking
        # local future check, ~us)
        while self._outstanding and (
            self._outstanding[0].realized is not None
            or self._outstanding[0].out.is_ready()
        ):
            self._outstanding.pop(0)
        while len(self._outstanding) < self.max_dispatches:
            pend = self._pending_items()
            if not pend:
                return
            k = min(len(pend), self.microbatch)
            k = 1 << (k.bit_length() - 1)  # power-of-2 bucket
            self._dispatch(pend[:k])

    def _realize(self, d: _Dispatch) -> np.ndarray:
        import time as _time

        if d.realized is None:
            arr = np.asarray(d.out)
            d.out = None
            d.realized = arr
            d.t_done = _time.perf_counter()
        return d.realized

    def _claim(self, item) -> np.ndarray:
        d, row = item[1], item[2]
        arr = self._realize(d)
        self._completed += 1
        self._latency_sum += d.t_done - item[3]
        if self._last_complete_time is None or d.t_done > self._last_complete_time:
            self._last_complete_time = d.t_done
        return arr[row:row + 1]

    # -- public API --------------------------------------------------------
    def update_base(self, base_frame) -> None:
        self.flush()  # queued frames keep the base they were submitted under
        self.base_frame = None if base_frame is None else jnp.asarray(base_frame)

    def flush(self) -> None:
        """Dispatch every queued-but-undispatched frame now, ignoring the
        dispatch-slot bound (a bounded burst: the queue itself is bounded)."""
        while True:
            pend = self._pending_items()
            if not pend:
                return
            k = min(len(pend), self.microbatch)
            k = 1 << (k.bit_length() - 1)
            self._dispatch(pend[:k])

    def submit(self, frame) -> bool:
        """Enqueue one dual frame; returns True if admitted (False only
        under drop_policy='newest' with a full queue)."""
        import time as _time

        if len(self._queue) >= self.max_inflight:
            if self.drop_policy == "newest":
                self._dropped += 1
                return False
            if self.drop_policy == "oldest":
                self._queue.pop(0)  # zombie device work, if any, not cancelled
                self._dropped += 1
            else:  # block: bound DEVICE work; the result queue may grow
                if self._outstanding:
                    d = self._outstanding.pop(0)
                    if d.out is not None:  # not already realized by a get()
                        d.out.block_until_ready()
                if not self._warned and len(self._queue) > self.results_warn:
                    import warnings

                    warnings.warn(
                        f"StreamingEngine(drop_policy='block'): {len(self._queue)} "
                        "unclaimed results queued — the consumer is not draining; "
                        "memory grows until get()/drain() is called",
                        RuntimeWarning,
                        stacklevel=2,
                    )
                    self._warned = True
        frame = jnp.asarray(frame)
        if frame.ndim == 3:
            frame = frame[None]
        t = _time.perf_counter()
        if self._first_submit_time is None:
            self._first_submit_time = t
        self._queue.append([frame, None, None, t])
        self._submitted += 1
        self._pump()
        return True

    def get(self) -> np.ndarray:
        """Realize and return the oldest unclaimed result (FIFO)."""
        if not self._queue:
            raise IndexError("get() on an empty StreamingEngine")
        if self._queue[0][1] is None:
            # head still undispatched (slots were held by dropped frames'
            # zombie work): the consumer asked, so dispatch past the bound
            self.flush()
        item = self._queue.pop(0)
        out = self._claim(item)
        self._pump()  # realization freed a slot — coalesce what queued up
        return out

    def drain(self):
        """Realize and return ALL unclaimed results, in FIFO order."""
        self.flush()
        out = [self._claim(it) for it in self._queue]
        self._queue.clear()
        return out

    @property
    def pending(self) -> int:
        return len(self._queue)

    def stats(self) -> dict:
        """Self-reported counters: frames submitted/completed/dropped,
        dispatch count and mean micro-batch size, mean submit->result
        latency, and end-to-end throughput over the completed stream."""
        elapsed = (
            self._last_complete_time - self._first_submit_time
            if self._completed and self._first_submit_time is not None
            else 0.0
        )
        return {
            "submitted": self._submitted,
            "completed": self._completed,
            "dropped": self._dropped,
            "pending": len(self._queue),
            "dispatches": self._n_dispatches,
            "mean_dispatch_size": (
                self._frames_dispatched / self._n_dispatches
                if self._n_dispatches else None
            ),
            "mean_latency_ms": (
                1e3 * self._latency_sum / self._completed if self._completed else None
            ),
            "throughput_fps": (
                self._completed / elapsed if self._completed and elapsed > 0 else None
            ),
        }
