"""Headline benchmark: dual-sensor 320x427 depth frames/sec/chip.

Measures the full deployable graph (BASELINE.json configs 1-2) on the real
TPU: raw (N, 6, 320, 427) dual-GelSlim frames + base frame -> Pallas fused
per-finger difference/resize/normalize -> flagship U-Net (bf16 compute,
f32 accumulation) -> denormalize to mm -> area resize back to 320x427 ->
(N, 2, 320, 427).

Timing uses gelslim_depth_tpu.utils.device_time: scan-chained iterations
with a data-dependent carry and a single host readback, differenced over
two chain lengths — the only sound methodology on tunneled runtimes where
block_until_ready does not synchronize with device execution.

Prints exactly ONE JSON line on stdout:
  {"metric": "dual_frames_per_sec_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N/1000, ...}
vs_baseline is against the driver's north-star target of 1,000 dual-sensor
frames/s/chip (BASELINE.md; the reference publishes no throughput numbers).
Secondary fields: bf16_value/bf16_mfu/bf16_tflops describe the bf16 parity
graph; int8_value/int8_delta_mm the quantized serving graph (delta measured
on HELD-OUT tactile-like frames, distinct from the calibration batch);
batch1_* the single-frame streaming regime; train_* the training step.
Diagnostics go to stderr.
"""

import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

# persistent compilation cache: repeated bench invocations skip the ~60s
# XLA compiles (the cache key includes program + compiler version, so this
# is safe across code edits)
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/gelslim_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PEAK_BF16 = 197e12  # v5e bf16 peak FLOP/s
PEAK_INT8 = 394e12  # v5e int8 peak OP/s (the int8 graph keeps ~15% of its
# FLOPs in bf16, so its honest ceiling is lower; the guard is vs hard physics)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def roofline_guard(name, time_fn, n_frames, flops_per_frame, peak):
    """Measure n_frames / time_fn(); REFUSE any rate above the hardware peak.

    Round-3 shipped a batch-1 int8 line at 11,264 f/s — 3.2x over the 394
    TOPS int8 roofline — because sub-ms graphs were timed with fixed short
    chains and nothing cross-checked the implied FLOP/s. Every timed line
    now computes its roofline fraction; an impossible number is remeasured
    once and, if still impossible, recorded as null with a 'suspect' note
    rather than shipped. Returns (dt, rate, roofline_frac) — (None, None,
    frac) when suspect.
    """
    frac = None
    for _attempt in range(2):
        dt = time_fn()
        rate = n_frames / dt
        frac = rate * flops_per_frame / peak if flops_per_frame else None
        if frac is None or frac <= 1.0:
            return dt, rate, frac
        log(f"{name}: {rate:.1f}/s implies {frac:.2f}x the "
            f"{peak / 1e12:.0f} T roofline — physically impossible, remeasuring")
    log(f"{name}: still above roofline after remeasure — SUSPECT, recording null")
    return None, None, frac


def make_tactile_frames(seed: int, n: int):
    """Realistic dual-sensor frames: smooth Gaussian indentations on a
    noisy base (data/synthetic.py) — the low-contrast, spatially-correlated
    activation regime real serving sees, unlike uniform noise. Returns
    (frames (n, 6, 320, 427), base (6, 320, 427))."""
    from gelslim_depth_tpu.data.synthetic import make_synthetic_object

    obj = make_synthetic_object(np.random.RandomState(seed), n=n, image_size=(320, 427))
    return (
        jnp.asarray(obj["tactile_image"]),
        jnp.asarray(obj["base_tactile_image"][0]),
    )


PRIMARY_CONVERGENCE = "unet_synth_convergence"


def load_convergence_summaries(art_dir: str = None):
    """All checked-in convergence artifacts
    (scripts/train_convergence.py -> artifacts/convergence/*_summary.json),
    surfaced as convergence_* fields in the bench JSON so the driver
    records learning evidence, not just throughput (VERDICT r3 item 3).
    The PRIMARY_CONVERGENCE artifact (the synthetic-corpus flagship run)
    is moved to the end and provides the primary fields; the others get
    compact per-corpus extras. Selection is strictly by the summary's own
    name — if the flagship artifact is missing/unreadable, NO summary is
    promoted to the primary fields (the headline must never silently
    become a different corpus's run)."""
    import glob

    if art_dir is None:
        here = os.path.dirname(os.path.abspath(__file__))
        art_dir = os.path.join(here, "artifacts", "convergence")
    paths = sorted(glob.glob(os.path.join(art_dir, "*_summary.json")))
    out = []
    for p in paths:
        try:
            with open(p) as f:
                out.append(json.load(f))
        except Exception as e:
            log(f"convergence summary unreadable ({p}): {e}")
    # only ONE summary may carry the primary name: a duplicate (e.g. a
    # re-run saved under another filename) would silently overwrite the
    # primary convergence_* fields — keep the first (by filename order) as
    # primary and demote the rest to uniquely-tagged extras
    n_dup = 0
    seen_primary = False
    for i, c in enumerate(out):
        if c.get("name") != PRIMARY_CONVERGENCE:
            continue
        if not seen_primary:
            seen_primary = True
            continue
        n_dup += 1
        dup = dict(c)
        dup["name"] = f"unet_synth_dup{n_dup}_convergence"
        out[i] = dup
        log(f"duplicate '{PRIMARY_CONVERGENCE}' summary demoted to extras "
            f"as {dup['name']} (only the first is the primary)")
    out.sort(key=lambda c: c.get("name") == PRIMARY_CONVERGENCE)
    return out


def load_convergence_summary():
    """The primary (flagship synthetic-corpus) convergence artifact, or
    None when it is absent — never a substitute."""
    for c in load_convergence_summaries():
        if c.get("name") == PRIMARY_CONVERGENCE:
            return c
    return None


def main():
    from gelslim_depth_tpu.config import GelslimConfig
    from gelslim_depth_tpu.inference import fused_predict_dual
    from gelslim_depth_tpu.models.unet import init_unet
    from gelslim_depth_tpu.utils import device_time

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
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}, platform {dev.platform}")

    rng = np.random.RandomState(0)
    base = jnp.asarray(rng.uniform(0, 255, (6, 320, 427)).astype(np.float32))

    def graph(p, s, x, b, carry):
        # use_pallas=None auto-enables the Pallas fused front-end on TPU
        # (bit-identical to the XLA path; +17% at batch 1, +1% at 64 —
        # the XLA front-end is only partially overlapped with the U-Net)
        return fused_predict_dual(
            config, unet_cfg, p, s, x + carry, b, (320, 427),
            compute_dtype=jnp.bfloat16,
        )

    # model FLOPs for MFU accounting (XLA cost analysis of the full fused
    # graph; v5e bf16 peak = 197 TFLOP/s)
    flops_per_frame = None
    try:
        x_ca = jnp.asarray(rng.uniform(0, 255, (64, 6, 320, 427)).astype(np.float32))
        compiled = jax.jit(
            lambda p, s, x, b: fused_predict_dual(
                config, unet_cfg, p, s, x, b, (320, 427), compute_dtype=jnp.bfloat16
            )
        ).lower(params, stats, x_ca, base).compile()
        flops_per_frame = compiled.cost_analysis().get("flops", 0.0) / 64
        log(f"model cost: {flops_per_frame / 1e9:.1f} GFLOP per dual frame")
    except Exception as e:
        log(f"cost analysis unavailable: {type(e).__name__}: {e}")

    best = (0.0, None, 0.0)
    for batch in (16, 32, 64, 128):
        try:
            x = jnp.asarray(rng.uniform(0, 255, (batch, 6, 320, 427)).astype(np.float32))
            dt, fps, mfu = roofline_guard(
                f"bf16 batch {batch}",
                lambda: device_time(graph, params, stats, x, base, repeats=3),
                batch, flops_per_frame, PEAK_BF16)
            if fps is None:
                continue
            log(f"batch {batch}: {dt * 1e3:.2f} ms/iter, {fps:.1f} frames/s, "
                f"MFU {(mfu or 0.0) * 100:.1f}%")
            if fps > best[0]:
                best = (fps, batch, mfu or 0.0)
        except Exception as e:
            log(f"batch {batch} failed: {type(e).__name__}: {e}")

    fps, batch, mfu = best
    log(f"best bf16: batch {batch} -> {fps:.1f} dual frames/s/chip")

    # --- int8 PTQ serving path (models/quantize.py) ----------------------
    # Calibration AND fitness evaluation use tactile-like frames (smooth
    # contact blobs on a noisy base), with the fitness delta measured on a
    # HELD-OUT batch distinct from calibration — the honest number for the
    # activation-scale regime real serving sees. Headline promotion rule:
    # the quantized graph becomes the headline only when that held-out
    # delta vs the f32 graph ON THESE VERY WEIGHTS is under 10% of the
    # 0.05 mm parity budget — the delta ships in the JSON either way.
    int8_fps, int8_delta_mm, int8_batch, int8_frac = 0.0, float("inf"), None, None
    qpred = None
    try:
        from gelslim_depth_tpu.inference import Predictor, fused_predict_dual as _fpd
        from gelslim_depth_tpu.models.quantize import unet_apply_int8

        pred = Predictor(config, params, stats, compute_dtype=jnp.bfloat16)
        calib, tac_base = make_tactile_frames(seed=10, n=8)
        qpred = pred.quantize(calib, tac_base)
        q = qpred.q

        held_out, _ = make_tactile_frames(seed=11, n=4)
        y_q = qpred.predict_dual_frames(held_out, tac_base, (320, 427))
        y_f = fused_predict_dual(config, unet_cfg, params, stats, held_out, tac_base,
                                 (320, 427), compute_dtype=jnp.float32)
        int8_delta_mm = float(jnp.sqrt(jnp.mean((y_q - y_f) ** 2)))
        log(f"int8 delta vs f32 graph (held-out tactile frames): "
            f"{int8_delta_mm:.5f} mm RMSE (calib self-report {qpred.delta_mm:.5f} mm)")
        # uniform-noise delta kept as a distribution-shift diagnostic
        xu = jnp.asarray(rng.uniform(0, 255, (4, 6, 320, 427)).astype(np.float32))
        yu_q = qpred.predict_dual_frames(xu, tac_base, (320, 427))
        yu_f = fused_predict_dual(config, unet_cfg, params, stats, xu, tac_base,
                                  (320, 427), compute_dtype=jnp.float32)
        log(f"int8 delta on uniform noise (diagnostic): "
            f"{float(jnp.sqrt(jnp.mean((yu_q - yu_f) ** 2))):.5f} mm RMSE")

        def graph_q(q, x, b, carry):
            return _fpd(config, q.cfg, q.params, q.batch_stats, x + carry, b, (320, 427),
                        compute_dtype=jnp.bfloat16,
                        net_fn=lambda z: unet_apply_int8(q, z, compute_dtype=jnp.bfloat16))

        for b in (64, 128):
            x = jnp.asarray(rng.uniform(0, 255, (b, 6, 320, 427)).astype(np.float32))
            # timed with the tactile base the graph was calibrated against
            # (round-3 used the uniform-noise base here — same speed, but a
            # regime mismatch with the calibration; VERDICT r3 item 7)
            dt, fps_q, frac_q = roofline_guard(
                f"int8 batch {b}",
                lambda: device_time(graph_q, q, x, tac_base, repeats=3),
                b, flops_per_frame, PEAK_INT8)
            if fps_q is None:
                continue
            log(f"int8 batch {b}: {dt * 1e3:.2f} ms/iter, {fps_q:.1f} frames/s, "
                f"int8-roofline {(frac_q or 0.0) * 100:.1f}%")
            if fps_q > int8_fps:
                int8_fps, int8_batch, int8_frac = fps_q, b, frac_q
    except Exception as e:
        log(f"int8 path failed: {type(e).__name__}: {e}")

    # --- int8 + row-split int8 upconvs (quantize --int8_upconvs) ---------
    # The transposed convs are the largest bf16 remnant of the int8 graph
    # (~6.9 ms at batch 64); the row-split formulation runs them as int8
    # matmuls with contiguous row interleaving. Measured separately and
    # promoted only if faster AND within the same delta budget.
    int8u_fps, int8u_delta_mm, int8u_batch, int8u_frac = 0.0, float("inf"), None, None
    qpred_u = None
    try:
        if qpred is not None:
            pred = Predictor(config, params, stats, compute_dtype=jnp.bfloat16)
            qpred_u = pred.quantize(calib, tac_base, quantize_upconvs=True)
            y_qu = qpred_u.predict_dual_frames(held_out, tac_base, (320, 427))
            int8u_delta_mm = float(jnp.sqrt(jnp.mean((y_qu - y_f) ** 2)))
            log(f"int8+upconv delta vs f32 graph (held-out tactile frames): "
                f"{int8u_delta_mm:.5f} mm RMSE")
            for b in (64, 128):
                x = jnp.asarray(rng.uniform(0, 255, (b, 6, 320, 427)).astype(np.float32))
                dt, fps_u, frac_u = roofline_guard(
                    f"int8+upconv batch {b}",
                    lambda: device_time(graph_q, qpred_u.q, x, tac_base, repeats=3),
                    b, flops_per_frame, PEAK_INT8)
                if fps_u is None:
                    continue
                log(f"int8+upconv batch {b}: {dt * 1e3:.2f} ms/iter, {fps_u:.1f} "
                    f"frames/s, int8-roofline {(frac_u or 0.0) * 100:.1f}%")
                if fps_u > int8u_fps:
                    int8u_fps, int8u_batch, int8u_frac = fps_u, b, frac_u
    except Exception as e:
        log(f"int8+upconv path failed: {type(e).__name__}: {e}")

    best_int8_fps, best_int8_batch = int8_fps, int8_batch
    best_int8_delta, best_int8_pred = int8_delta_mm, qpred
    if int8u_fps > int8_fps and int8u_delta_mm < 0.005:
        best_int8_fps, best_int8_batch = int8u_fps, int8u_batch
        best_int8_delta, best_int8_pred = int8u_delta_mm, qpred_u
        log("int8+upconv graph beats plain int8 — using it for the int8 headline")

    promote = best_int8_fps > fps and best_int8_delta < 0.005
    head_fps, head_batch = (best_int8_fps, best_int8_batch) if promote else (fps, batch)
    log(f"headline: {'int8' if promote else 'bf16'} batch {head_batch} -> "
        f"{head_fps:.1f} dual frames/s/chip")

    # --- batch-1 streaming (the video-rate serving case) -----------------
    # The round-3 failure lived exactly here: ~1 ms graphs timed with fixed
    # 8-step chains. device_time now auto-scales the chain (~256 steps for
    # these graphs) and every line passes through the roofline guard.
    batch1_bf16_fps = batch1_int8_fps = None
    batch1_bf16_frac = batch1_int8_frac = None
    try:
        x1 = jnp.asarray(rng.uniform(0, 255, (1, 6, 320, 427)).astype(np.float32))
        dt1, batch1_bf16_fps, batch1_bf16_frac = roofline_guard(
            "batch-1 bf16",
            lambda: device_time(graph, params, stats, x1, base, repeats=3),
            1, flops_per_frame, PEAK_BF16)
        if batch1_bf16_fps is not None:
            log(f"batch-1 bf16 latency: {dt1 * 1e3:.2f} ms "
                f"({batch1_bf16_fps:.0f} dual frames/s, "
                f"MFU {(batch1_bf16_frac or 0.0) * 100:.1f}%)")
        if best_int8_pred is not None:
            dt1q, batch1_int8_fps, batch1_int8_frac = roofline_guard(
                "batch-1 int8",
                lambda: device_time(graph_q, best_int8_pred.q, x1, tac_base, repeats=3),
                1, flops_per_frame, PEAK_INT8)
            if batch1_int8_fps is not None:
                log(f"batch-1 int8{'+upconv' if best_int8_pred is qpred_u else ''} "
                    f"latency: {dt1q * 1e3:.2f} ms "
                    f"({batch1_int8_fps:.0f} dual frames/s, "
                    f"int8-roofline {(batch1_int8_frac or 0.0) * 100:.1f}%)")
    except Exception as e:
        log(f"batch-1 diag failed: {type(e).__name__}: {e}")
    batch1_candidates = [v for v in (batch1_bf16_fps, batch1_int8_fps) if v]
    batch1_fps = max(batch1_candidates) if batch1_candidates else None

    # --- int8 micro-batch (streaming, 2-4 frames per dispatch) -----------
    # Batch 1 sits just under the 1,000 f/s north star (per-layer
    # small-shape latency, docs/PERFORMANCE.md); grouping 2 frames into one
    # dispatch (StreamingEngine.submit accepts a pre-batched array) crosses
    # it while keeping ~2 ms latency. Measured so the latency/throughput
    # tradeoff ships as data, not extrapolation.
    microbatch_int8 = {}
    try:
        if best_int8_pred is not None:
            for mb in (2, 4):
                xm = jnp.asarray(
                    rng.uniform(0, 255, (mb, 6, 320, 427)).astype(np.float32))
                dtm, fpsm, _ = roofline_guard(
                    f"int8 micro-batch {mb}",
                    lambda: device_time(graph_q, best_int8_pred.q, xm, tac_base,
                                        repeats=3),
                    mb, flops_per_frame, PEAK_INT8)
                if fpsm is not None:
                    microbatch_int8[mb] = fpsm
                    log(f"int8 micro-batch {mb}: {dtm * 1e3:.2f} ms/dispatch, "
                        f"{fpsm:.0f} dual frames/s")
    except Exception as e:
        log(f"micro-batch diag failed: {type(e).__name__}: {e}")

    # --- StreamingEngine single-frame-arrival feed loop ------------------
    # The engine's own adaptive micro-batching (VERDICT r4 item 1): a
    # sensor feeding SINGLE frames faster than the chip serves them must
    # sustain >=1,000 dual frames/s with the ENGINE doing the batching.
    # Composition of two sound measurements (wall-clocking the loop here
    # would measure the tunnel, not the chip — docs/PERFORMANCE.md
    # "Streaming on tunneled terminals": D2H is ~2.5 MB/s and completion
    # visibility lags ~5 ms): (a) the REAL engine runs a real backlogged
    # 64-frame feed on-device and its dispatch trace + host-side
    # per-submit overhead are recorded; (b) each dispatch size the trace
    # contains has its device time measured by the roofline-guarded
    # device_time lines above (batch1_int8_fps, microbatch{2,4}_int8_fps).
    # streaming_engine_fps = frames / (sum of the trace's per-dispatch
    # device times + the measured host overhead). On real TPU-VM PCIe the
    # same feed loop is directly wall-clockable and the engine pipelines
    # at this rate.
    streaming_fps = streaming_mean_dispatch = streaming_host_ms = None
    try:
        if best_int8_pred is not None and batch1_int8_fps:
            import time as _time

            from gelslim_depth_tpu.inference import StreamingEngine

            rate_by_k = {1: batch1_int8_fps}
            for mb, v in microbatch_int8.items():
                rate_by_k[mb] = v

            class _TracePredictor:
                def __init__(self, inner):
                    self.inner, self.sizes = inner, []

                def predict_dual_frames_multi(self, fl, b, osz):
                    self.sizes.append(len(fl))
                    return self.inner.predict_dual_frames_multi(fl, b, osz)

            feed = [
                jax.device_put(
                    rng.uniform(0, 255, (1, 6, 320, 427)).astype(np.float32))
                for _ in range(8)
            ]
            for k in sorted(rate_by_k):  # compile outside the traced loop
                best_int8_pred.predict_dual_frames_multi(feed[:k], tac_base, (320, 427))
            _time.sleep(0.5)

            n_feed, trials = 64, 3
            traces, host_ms = [], []
            for _ in range(trials):
                tp = _TracePredictor(best_int8_pred)
                eng = StreamingEngine(
                    tp, (320, 427), base_frame=tac_base,
                    max_inflight=n_feed, drop_policy="block",
                )
                t0 = _time.perf_counter()
                for i in range(n_feed):
                    eng.submit(feed[i % len(feed)])
                host_ms.append((_time.perf_counter() - t0) / n_feed * 1e3)
                eng.flush()
                traces.append(list(tp.sizes))
                eng.drain()
            trace = traces[-1]  # post-warmup steady state
            streaming_host_ms = float(np.median(host_ms))
            if all(k in rate_by_k for k in trace):
                device_s = sum(k / rate_by_k[k] for k in trace)
                total_s = device_s + n_feed * streaming_host_ms / 1e3
                streaming_fps = n_feed / total_s
                streaming_mean_dispatch = n_feed / len(trace)
                log(f"streaming engine feed loop ({n_feed} single-frame submits, "
                    f"engine defaults mb=4/disp=2): dispatch trace {trace}, "
                    f"host {streaming_host_ms:.3f} ms/frame -> "
                    f"{streaming_fps:.0f} dual frames/s sustained "
                    f"(mean dispatch {streaming_mean_dispatch:.2f} frames)")
            else:
                log(f"streaming trace contains unmeasured dispatch sizes "
                    f"{sorted(set(trace) - set(rate_by_k))} — not reporting")
    except Exception as e:
        log(f"streaming engine diag failed: {type(e).__name__}: {e}")

    # --- training step (BASELINE config 3): fwd+bwd+Adam+EMA @ 160x213 ---
    # NHWC (channels-last baked data, no per-step layout transpose) is the
    # production path; NCHW bs=16 is kept as the parity-recipe diagnostic.
    train_fps = train_mfu = train_batch = None
    train_fps16 = train_mfu16 = None
    try:
        from gelslim_depth_tpu.train import create_train_state, make_optimizer, make_train_step

        opt = make_optimizer()
        state = create_train_state(jax.random.PRNGKey(1), unet_cfg, opt)

        def measure_train(bt, channels_last):
            step = make_train_step(unet_cfg, opt, compute_dtype=jnp.bfloat16,
                                   channels_last=channels_last)
            shape_x = (bt, 160, 213, 3) if channels_last else (bt, 3, 160, 213)
            shape_y = (bt, 160, 213, 1) if channels_last else (bt, 1, 160, 213)
            imgs = jnp.asarray(rng.uniform(0, 1, shape_x).astype(np.float32))
            tgts = jnp.asarray(rng.uniform(-0.9, 0, shape_y).astype(np.float32))

            def train_fn(s, im, tg, carry):
                new_state, loss = step(s, im + carry, tg)
                # fold a nonzero-epsilon dependence on EVERY updated leaf
                # (params, optimizer moments, EMA, batch stats) so no part
                # of the backward pass or optimizer can be dead-code-
                # eliminated. (Round-1 bug: probing only outc.b let XLA DCE
                # the whole backward through the network — the gradient of
                # the LAST layer's bias needs no chain rule — reporting
                # ~2,500 samples/s, 1.9x above hardware peak for the true
                # FLOPs.)
                leaves = jax.tree_util.tree_leaves(new_state)
                probe = sum(jnp.mean(l.astype(jnp.float32)) for l in leaves)
                return loss[None] + 1e-20 * probe

            step_flops = None
            try:
                step_flops = jax.jit(step).lower(state, imgs, tgts).compile().cost_analysis().get("flops", 0.0)
            except Exception:
                pass
            lay = "NHWC" if channels_last else "NCHW"
            dt, rate, mfu_t = roofline_guard(
                f"train bs{bt} {lay}",
                lambda: device_time(train_fn, state, imgs, tgts, repeats=2),
                1, step_flops, PEAK_BF16)
            if rate is None:
                return None, None
            log(f"train step (bs={bt}, bf16, {lay}): {dt * 1e3:.2f} ms -> "
                f"{bt / dt:.0f} samples/s"
                + (f", MFU {mfu_t * 100:.1f}%" if mfu_t else ""))
            return bt / dt, mfu_t

        train_fps16, train_mfu16 = measure_train(16, channels_last=False)
        for bt in (16, 128):
            f_t, m_t = measure_train(bt, channels_last=True)
            if f_t is not None and (train_fps is None or f_t > train_fps):
                train_fps, train_mfu, train_batch = f_t, m_t, bt
        log("(reference late-run epochs: ~1,250 s; see BASELINE.md)")
    except Exception as e:
        log(f"train diag failed: {type(e).__name__}: {e}")

    convs = load_convergence_summaries()
    conv_fields = {}
    if convs and convs[-1].get("name") != PRIMARY_CONVERGENCE:
        log(f"flagship convergence artifact '{PRIMARY_CONVERGENCE}' missing — "
            f"primary convergence_* fields omitted (no substitute promoted)")
    for i, conv in enumerate(convs):
        primary = conv.get("name") == PRIMARY_CONVERGENCE
        if primary:
            conv_fields.update({
                "convergence_epochs": conv.get("epochs"),
                "convergence_train_samples": conv.get("train_samples"),
                "convergence_val_loss_init": conv.get("val_loss_init"),
                "convergence_val_loss_first": conv.get("val_loss_first"),
                "convergence_val_loss_min": conv.get("val_loss_min"),
                "convergence_val_drop_ratio_init": None
                if conv.get("val_drop_ratio_init") is None
                else round(conv["val_drop_ratio_init"], 1),
                "convergence_epoch_time_s": conv.get("epoch_time_s_median"),
            })
        else:
            # compact fields for the secondary corpora (e.g. the real-STL
            # geometry run): unet_<tag>_convergence -> convergence_<tag>_*
            tag = conv.get("name", f"extra{i}").replace("unet_", "").replace("_convergence", "")
            conv_fields.update({
                f"convergence_{tag}_epochs": conv.get("epochs"),
                f"convergence_{tag}_val_loss_min": conv.get("val_loss_min"),
                f"convergence_{tag}_val_drop_ratio_init": None
                if conv.get("val_drop_ratio_init") is None
                else round(conv["val_drop_ratio_init"], 1),
            })
            if conv.get("early_stop_mode", "off") != "off":
                conv_fields[f"convergence_{tag}_early_stopped"] = conv.get("early_stopped")

        def _fmt(v, spec):
            # optional summary fields may be absent (older/newer schema);
            # a diagnostics line must never crash the benchmark
            return format(v, spec) if isinstance(v, (int, float)) else "n/a"

        log(f"convergence artifact: {conv.get('name')} — {conv.get('epochs')} epochs, "
            f"val init {_fmt(conv.get('val_loss_init'), '.6g')} -> "
            f"epoch-1 {_fmt(conv.get('val_loss_first'), '.6g')} -> "
            f"min {_fmt(conv.get('val_loss_min'), '.6g')}, "
            f"median epoch {_fmt(conv.get('epoch_time_s_median'), '.1f')} s")

    print(
        json.dumps(
            {
                "metric": "dual_frames_per_sec_per_chip",
                "value": round(head_fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(head_fps / 1000.0, 3),
                "graph": "int8_ptq" if promote else "bf16",
                "bf16_value": round(fps, 1),
                "bf16_mfu": round(mfu, 3),
                "bf16_tflops": round(fps * flops_per_frame / 1e12, 1) if flops_per_frame else None,
                "int8_value": round(int8_fps, 1),
                "int8_delta_mm": None if int8_delta_mm == float("inf") else round(int8_delta_mm, 6),
                # row-split int8 transposed convs (quantize --int8_upconvs)
                "int8_upconv_value": round(int8u_fps, 1),
                "int8_upconv_delta_mm": None if int8u_delta_mm == float("inf") else round(int8u_delta_mm, 6),
                "int8_headline_variant": "upconv" if best_int8_pred is qpred_u and qpred_u is not None else "plain",
                # effective rate of the headline graph against the bf16 cost
                # model (for int8 this is NOT an MFU — the int8 MXU peak is
                # 2x — it is the equivalent-bf16 throughput)
                "headline_equiv_tflops": round(head_fps * flops_per_frame / 1e12, 1) if flops_per_frame else None,
                "best_batch": head_batch,
                # roofline_frac fields: measured rate / the dtype's hardware
                # peak — every timed line is refused (nulled + 'suspect')
                # if it implies a rate above 1.0 (see roofline_guard)
                "int8_roofline_frac": None if int8_frac is None else round(int8_frac, 3),
                "int8_upconv_roofline_frac": None if int8u_frac is None else round(int8u_frac, 3),
                "batch1_fps": None if batch1_fps is None else round(batch1_fps, 1),
                "batch1_bf16_fps": None if batch1_bf16_fps is None else round(batch1_bf16_fps, 1),
                "batch1_bf16_roofline_frac": None if batch1_bf16_frac is None else round(batch1_bf16_frac, 3),
                "batch1_int8_fps": None if batch1_int8_fps is None else round(batch1_int8_fps, 1),
                "batch1_int8_roofline_frac": None if batch1_int8_frac is None else round(batch1_int8_frac, 3),
                # streaming with 2/4 frames in flight (see the micro-batch
                # bench section): where the 1,000 f/s line is crossed
                "microbatch2_int8_fps": None if 2 not in microbatch_int8 else round(microbatch_int8[2], 1),
                "microbatch4_int8_fps": None if 4 not in microbatch_int8 else round(microbatch_int8[4], 1),
                # the engine's OWN sustained rate on a single-frame-arrival
                # backlogged feed: real on-device dispatch trace x the
                # roofline-guarded per-dispatch-size device times above,
                # plus the measured host-side submit overhead
                "streaming_engine_fps": None if streaming_fps is None else round(streaming_fps, 1),
                "streaming_engine_mean_dispatch_size": None if streaming_mean_dispatch is None else round(streaming_mean_dispatch, 2),
                "streaming_engine_host_ms_per_frame": None if streaming_host_ms is None else round(streaming_host_ms, 3),
                "timing": "auto-chained device_time (>=0.2 s differenced signal), median-of-repeats, roofline-guarded",
                "train_samples_per_sec": None if train_fps is None else round(train_fps, 1),
                "train_mfu": None if train_mfu is None else round(train_mfu, 3),
                "train_batch": train_batch,
                "train_bs16_nchw_samples_per_sec": None if train_fps16 is None else round(train_fps16, 1),
                **conv_fields,
            }
        )
    )
    sys.stdout.flush()

    # --- stderr diagnostics (not part of the headline metric) ------------
    try:
        # bf16-vs-f32 output delta in mm on this graph (accuracy proxy for
        # the bf16 compute path; the <0.05mm torch-parity gate lives in
        # tests/)
        x = jnp.asarray(rng.uniform(0, 255, (4, 6, 320, 427)).astype(np.float32))
        y16 = fused_predict_dual(config, unet_cfg, params, stats, x, base, (320, 427),
                                 compute_dtype=jnp.bfloat16)
        y32 = fused_predict_dual(config, unet_cfg, params, stats, x, base, (320, 427),
                                 compute_dtype=jnp.float32)
        rmse = float(jnp.sqrt(jnp.mean((y16 - y32) ** 2)))
        log(f"bf16 vs f32 output RMSE: {rmse:.5f} mm")
    except Exception as e:
        log(f"accuracy diag failed: {type(e).__name__}: {e}")

    try:
        # mesh->depth GT generation throughput (BASELINE config 4): one
        # 100k-point object, 320x427 output — the reference runs one CPU
        # Delaunay + 2 scattered interps per sample (minutes per object)
        from gelslim_depth_tpu.meshgen import plane_spec, render_depth_batch

        pts = jnp.asarray(rng.uniform(-8, 8, (100_000, 3)).astype(np.float32))
        poses = jnp.asarray(rng.uniform(-0.003, 0.003, (32, 3)).astype(np.float32))
        widths = jnp.asarray(rng.uniform(10, 14, (32,)).astype(np.float32))
        spec = plane_spec("+y+z")

        def gt_fn(pc, poses, widths, carry):
            return render_depth_batch(
                pc + carry, poses, widths, spec=spec, image_size=(320, 427),
                mm_per_pixel=12.0 / 320.0, fill_iters=6,
            )

        dt = device_time(gt_fn, pts, poses, widths, repeats=2)
        # sanity ceiling for this diagnostic line (it has no FLOP model for
        # roofline_guard): the splat performs 100k placements per sample and
        # TPU random access tops out at ~200M elements/s (measured, see
        # docs/PERFORMANCE.md meshgen section) — an implied placement rate
        # an order of magnitude above that wall is a measurement artifact
        if (32 / dt) * 100_000 > 2e9:
            log(f"meshgen GT: {32 / dt:.0f} samples/s implies "
                f"{(32 / dt) * 1e5 / 1e6:.0f}M placements/s, >10x the measured "
                f"scatter wall — SUSPECT, not reporting")
        else:
            log(f"meshgen GT: {32 / dt:.0f} depth samples/s (100k-pt object, 320x427, "
                f"combined-finger min-splat; reference: ~minutes/object on CPU Delaunay)")
        # native CPU renderer: random-access bound, so it scales with host
        # cores (~83 samples/s/core); report it with the core count so the
        # number is interpretable on 1-vCPU dev containers vs real hosts
        import time as _time

        from gelslim_depth_tpu.meshgen.native_render import (
            native_renderer_available, render_depth_batch_native,
        )

        if native_renderer_available():
            pc_np = np.asarray(pts)
            poses_np = np.asarray(poses)
            widths_np = np.asarray(widths)
            kw = dict(spec=spec, image_size=(320, 427), mm_per_pixel=12.0 / 320.0,
                      fill_iters=6)
            render_depth_batch_native(pc_np, poses_np, widths_np, **kw)
            t0 = _time.perf_counter()
            render_depth_batch_native(pc_np, poses_np, widths_np, **kw)
            dt_n = _time.perf_counter() - t0
            log(f"meshgen native (C++): {32 / dt_n:.0f} samples/s on "
                f"{os.cpu_count()} host core(s) (~83/core; preferred backend "
                f"on >=8-core hosts)")
    except Exception as e:
        log(f"meshgen diag failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
