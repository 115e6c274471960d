"""Profiling / timing utilities (the aux subsystem the reference lacks —
its only instrumentation is wall-clock prints, SURVEY.md section 5.1).

device_time is the load-bearing piece: on tunneled/async runtimes (axon)
`block_until_ready()` returns before device execution finishes, so naive
timing measures dispatch, not compute (observed: "19,000 TFLOP/s" from a
v5e). The only reliable sync point is a host readback. device_time chains
K iterations of the function through a lax.scan whose carry is derived
from each step's output (no step can be elided or reordered), reads one
scalar back, and differences two chain lengths to cancel the constant
dispatch+readback overhead.
"""

from __future__ import annotations

import contextlib
import math
import time
from typing import Callable, List

import jax
import jax.numpy as jnp
from jax import lax

# device_time's clock, as a module-level seam: tests fake it by patching
# _now alone, without hijacking the process-global time.perf_counter that
# jax internals may also read mid-measurement
_now = time.perf_counter


def device_time(
    fn: Callable[..., jnp.ndarray],
    *args,
    iters: int | None = None,
    repeats: int = 3,
    min_chain_s: float = 0.2,
) -> float:
    """Seconds per single execution of fn(*args) on-device.

    fn must accept a trailing scalar perturbation argument and return an
    array: fn(*args, carry) — the carry (1e-12 * mean of the previous
    output) enforces sequential data dependence between iterations.

    When ``iters`` is None (default), the chain length is auto-scaled to
    the graph so the *differenced* signal (iters × per-step time) is at
    least ``min_chain_s`` seconds. This is the fix for the round-3 failure
    mode: an 8-vs-16-step chain on a ~1 ms graph differs by only ~8 ms —
    comparable to the tunneled terminal's dispatch jitter — and the
    difference of two independently-min'd measurements can collapse to
    near zero, reporting rates far above the hardware roofline (the
    shipped 0.09 ms batch-1 int8 line, 3.2x over int8 peak). A pilot run
    estimates the per-step time (differencing 8- and 32-step chains so the
    constant dispatch+readback overhead cancels in the estimate too), and
    the chain length is rounded up to a power of two so repeated bench
    runs hit the persistent compilation cache. Repeats are combined with
    the median (not min): two independent min's can land on opposite
    extremes of the jitter distribution, which is exactly how the diff
    collapsed.
    """

    _chains: dict = {}

    def chained(k):
        # memoized by chain length: the auto-scale pilot uses lengths 8/32,
        # which the main measurement reuses whenever iters lands there —
        # without the cache each reuse would recompile the full graph
        # (minutes per shape through the tunneled compiler)
        if k not in _chains:
            @jax.jit
            def run(*a):
                def body(c, _):
                    # f32 cast keeps the scan carry type stable whatever
                    # dtype fn returns (bf16 outputs otherwise fail scan's
                    # carry-type check)
                    return 1e-12 * jnp.mean(fn(*a, c)).astype(jnp.float32), None

                return lax.scan(body, jnp.float32(0.0), None, length=k)[0]

            _chains[k] = run
        return _chains[k]

    def timed(f):
        t0 = _now()
        out = float(f(*args))  # the readback is the sync point
        dt = _now() - t0
        assert out == out, "non-finite output during timing"
        return dt

    if iters is None:
        f8 = chained(8)
        float(f8(*args))  # compile + warm
        t8 = timed(f8)
        if t8 > min_chain_s:  # per-step >= min_chain_s/8: overhead negligible
            dt_est = t8 / 8
        else:
            # sub-ms regime: difference two pilot lengths so the constant
            # dispatch+readback term cancels out of the estimate
            f32_ = chained(32)
            float(f32_(*args))
            dt_est = max((timed(f32_) - t8) / 24.0, 1e-7)
        iters = 2 ** math.ceil(math.log2(max(min_chain_s / dt_est, 1.0)))
        iters = min(max(iters, 8), 4096)

    f1, f2 = chained(iters), chained(2 * iters)
    float(f1(*args))  # compile + warm
    float(f2(*args))

    def measure(f):
        # true median, robust to outliers on BOTH sides; for even repeat
        # counts average the middle pair (ts[n//2] alone would be the MAX
        # of two samples — a one-sided bias in exactly the jitter regime
        # this function exists to defeat)
        ts = sorted(timed(f) for _ in range(repeats))
        n = len(ts)
        return ts[n // 2] if n % 2 else 0.5 * (ts[n // 2 - 1] + ts[n // 2])

    return max((measure(f2) - measure(f1)) / iters, 1e-9)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace capture (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-clock step timer with summary statistics."""

    def __init__(self, window: int = 100):
        self.window = window
        self.times: List[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    @contextlib.contextmanager
    def step(self):
        self.start()
        yield
        self.stop()

    def summary(self) -> dict:
        if not self.times:
            return {"n": 0}
        ts = sorted(self.times)
        n = len(ts)
        return {
            "n": n,
            "mean_s": sum(ts) / n,
            "p50_s": ts[n // 2],
            "min_s": ts[0],
            "max_s": ts[-1],
        }
