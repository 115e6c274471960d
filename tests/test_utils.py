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
