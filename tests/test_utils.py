"""Utils tests: device-true timing and step timers."""

import time

import numpy as np
import jax.numpy as jnp

from gelslim_depth_tpu.utils import StepTimer, device_time


def test_device_time_scales_with_work():
    def small(x, carry):
        return x + carry

    def big(x, carry):
        y = x + carry
        for _ in range(20):
            y = jnp.dot(y, y)
        return y

    x = jnp.eye(256, dtype=jnp.float32) * 0.999
    t_small = device_time(small, x, iters=4, repeats=2)
    t_big = device_time(big, x, iters=4, repeats=2)
    assert t_big > t_small  # 20 matmuls must cost more than an add
    assert t_small < 0.5 and np.isfinite(t_big)


def test_device_time_auto_chain_scales_iters():
    """Auto mode (iters=None) must pick a chain long enough that the
    differenced signal is >= min_chain_s — the round-3 fix for sub-ms
    graphs whose 8-step chains drowned in dispatch jitter."""
    def tiny(x, carry):
        return x + carry

    x = jnp.ones((8, 8), dtype=jnp.float32)
    # tiny graph -> per-iter ~us -> auto iters must hit the 4096 cap or at
    # least far exceed the old fixed 8 (use a small target to bound runtime)
    t = device_time(tiny, x, min_chain_s=0.02, repeats=2)
    assert t > 0 and np.isfinite(t)
    assert t < 0.01  # a tiny add is not 10ms/iter — sanity on the estimate


def test_device_time_accepts_bf16_outputs():
    """The probe carry must stay f32 whatever dtype fn returns — a bf16
    forward (the production compute dtype) previously failed lax.scan's
    carry-type check inside the timing chain."""
    def bf16_fn(x, carry):
        return (x + carry).astype(jnp.bfloat16)

    x = jnp.ones((8, 8), dtype=jnp.float32)
    t = device_time(bf16_fn, x, iters=4, repeats=2)
    assert t > 0 and np.isfinite(t)


def test_device_time_median_is_two_sided():
    """With an even repeat count the combiner must average the middle
    pair, not take ts[n//2] (the max of two samples — a one-sided bias in
    exactly the jitter regime the median exists to defeat)."""
    from unittest import mock

    from gelslim_depth_tpu.utils import profiling

    # deterministic fake clock; measure(f2) runs BEFORE measure(f1) in
    # `(measure(f2) - measure(f1)) / iters`. Give f2 samples (9, 31) —
    # one jitter outlier — and f1 samples (1, 3): the two-sided medians
    # are 20 and 2 -> (20-2)/4 = 4.5; the old ts[n//2] combiner took the
    # maxima (31, 3) -> 7.0, fully exposed to the one-sided outlier
    ticks = iter([0.0, 9.0,    # f2 repeat 1 -> 9.0
                  0.0, 31.0,   # f2 repeat 2 -> 31.0 (outlier)
                  0.0, 1.0,    # f1 repeat 1 -> 1.0
                  0.0, 3.0])   # f1 repeat 2 -> 3.0
    def fn(x, carry):
        return x + carry

    x = jnp.ones((4,), dtype=jnp.float32)
    # patch the module's _now seam, not the process-global perf_counter —
    # jax internals may read the real clock mid-measurement
    with mock.patch.object(profiling, "_now", lambda: next(ticks)):
        t = device_time(fn, x, iters=4, repeats=2)
    assert t == 4.5


def test_roofline_guard_refuses_impossible_rates():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import bench

    # a "measurement" that implies 10x the peak must come back suspect
    dt, rate, frac = bench.roofline_guard(
        "fake", lambda: 1e-3, n_frames=1, flops_per_frame=10 * bench.PEAK_BF16 * 1e-3,
        peak=bench.PEAK_BF16)
    assert dt is None and rate is None
    assert frac is not None and frac > 1.0
    # a plausible measurement passes through untouched with its fraction
    dt, rate, frac = bench.roofline_guard(
        "ok", lambda: 1e-3, n_frames=1, flops_per_frame=0.5 * bench.PEAK_BF16 * 1e-3,
        peak=bench.PEAK_BF16)
    assert dt == 1e-3 and rate == 1000.0 and abs(frac - 0.5) < 1e-9
    # no cost model -> no guard, measurement passes with frac None
    dt, rate, frac = bench.roofline_guard("nc", lambda: 1e-3, 1, None, bench.PEAK_BF16)
    assert dt == 1e-3 and frac is None


def test_step_timer():
    st = StepTimer(window=3)
    for _ in range(5):
        with st.step():
            time.sleep(0.002)
    s = st.summary()
    assert s["n"] == 3  # window trims
    assert s["min_s"] >= 0.002
    assert s["p50_s"] <= s["max_s"]


def test_step_timer_window_and_summary():
    import time

    from gelslim_depth_tpu.utils.profiling import StepTimer

    t = StepTimer(window=3)
    assert t.summary() == {"n": 0}
    for _ in range(5):
        with t.step():
            time.sleep(0.001)
    s = t.summary()
    assert s["n"] == 3  # rolling window keeps the last 3
    assert 0 < s["min_s"] <= s["p50_s"] <= s["max_s"]
    assert s["mean_s"] > 0


def test_pin_platform_subprocess():
    """pin_platform must translate an explicit 'cpu' request (positional
    or JAX_PLATFORMS env) into jax.config BEFORE backend init — the env
    var alone is ignored when a TPU platform plugin is installed, which
    used to make CPU-requested CLI runs initialize (and hang on) the
    accelerator tunnel. Run in a clean subprocess so this session's
    platform pin does not mask the behavior."""
    import os
    import subprocess
    import sys

    code = """
import os
os.environ.pop("JAX_PLATFORMS", None)
from gelslim_depth_tpu.utils import pin_platform
import jax

pin_platform("cpu")
assert jax.config.jax_platforms == "cpu", jax.config.jax_platforms

# non-platform device strings (the reference's CUDA ordinals) are ignored
pin_platform("1")
assert jax.config.jax_platforms == "cpu"

# env mirror: pin_platform() with no arg honors JAX_PLATFORMS
jax.config.update("jax_platforms", None)
os.environ["JAX_PLATFORMS"] = "cpu"
pin_platform()
assert jax.config.jax_platforms == "cpu"

# a JAX-style priority list pins its head (forwarding the full list would
# make jax require BOTH platforms to initialize — a broken tunnel would
# then fail even the cpu half)
jax.config.update("jax_platforms", None)
os.environ["JAX_PLATFORMS"] = "cpu,tpu"
pin_platform()
assert jax.config.jax_platforms == "cpu", jax.config.jax_platforms
os.environ["JAX_PLATFORMS"] = "cpu"

import jax.numpy as jnp
assert jax.devices()[0].platform == "cpu"
print("PIN_OK", float(jnp.ones(()).sum()))
"""
    env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=240, env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PIN_OK 1.0" in proc.stdout
