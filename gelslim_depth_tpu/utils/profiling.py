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
import time
from typing import Callable, List

import jax
import jax.numpy as jnp
from jax import lax


def device_time(
    fn: Callable[..., jnp.ndarray],
    *args,
    iters: int = 8,
    repeats: int = 3,
) -> float:
    """Seconds per single execution of fn(*args) on-device.

    fn must accept a trailing scalar perturbation argument and return an
    array: fn(*args, carry) — the carry (1e-12 * mean of the previous
    output) enforces sequential data dependence between iterations.
    """

    def chained(k):
        @jax.jit
        def run(*a):
            def body(c, _):
                return 1e-12 * jnp.mean(fn(*a, c)), None

            return lax.scan(body, jnp.float32(0.0), None, length=k)[0]

        return run

    f1, f2 = chained(iters), chained(2 * iters)
    float(f1(*args))  # compile + warm
    float(f2(*args))

    def measure(f):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = float(f(*args))  # the readback is the sync point
            best = min(best, time.perf_counter() - t0)
            assert out == out, "non-finite output during timing"
        return best

    return (measure(f2) - measure(f1)) / iters


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
