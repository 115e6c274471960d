"""A/B: conv vs im2col-dot formulation of the deep int8 convs at batch 1.

The round-5 trace (scripts/trace_batch1.py + scripts/analyze_trace.py)
shows the batch-1 int8 graph is weight-STAGING-bound, not compute-bound:
the TensorCore stream is 99.3% "busy" but 23% of it is two reduce-window
regions that run 11 us standalone — they absorb waits on async weight
prefetches (the 9.4 MB s8[3,3,1024,1024] bottleneck weight alone spans
537 us of the 1.056 ms module). This script asks whether reformulating
the deep 3x3 convs as explicit im2col + int8 dot_general changes how XLA
stages those weights (a 2-D [9*cin, cout] dot operand vs the conv
emitter's 4-D kernel slices).

Measures, at batch 1 on the deep tower (the three largest-weight blocks:
down_2 20x26x256->512, down_3 10x13x512->1024, up_0 dc 20x26x1024->512):
  - conv formulation (the shipped _conv_int8_pre path)
  - im2col + dot formulation of the same int8 math
and checks bit-equality of the int32 accumulators.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_deepconv_batch1.py
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gelslim_depth_tpu.utils import device_time


def conv_form(qx, w8):
    return lax.conv_general_dilated(
        qx, w8, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def im2col_form(qx, w2d):
    """qx (n,h,w,cin) int8, w2d (9*cin, cout) int8 -> (n,h,w,cout) int32.

    Patches are built by stacking the 9 shifted views of the zero-padded
    input along a new minor axis, so the contraction is one MXU dot with
    a plain 2-D weight operand.
    """
    n, h, w, cin = qx.shape
    xp = jnp.pad(qx, ((0, 0), (1, 1), (1, 1), (0, 0)))
    views = [xp[:, dy:dy + h, dx:dx + w, :] for dy in range(3) for dx in range(3)]
    patches = jnp.concatenate(views, axis=-1)  # (n,h,w,9*cin)
    return lax.dot_general(
        patches.reshape(n * h * w, 9 * cin), w2d,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).reshape(n, h, w, -1)


def w_to_2d(w8):
    """(3,3,cin,cout) -> (9*cin,cout) matching im2col_form's patch order."""
    kh, kw, cin, cout = w8.shape
    return w8.reshape(kh * kw * cin, cout)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/gelslim_jax_cache")
    rng = np.random.RandomState(0)
    # (spatial, cin, cout) of the heavy blocks at batch 1
    blocks = [
        ("down_2.conv2 20x26x512->512", (20, 26), 512, 512),
        ("down_3.conv1 10x13x512->1024", (10, 13), 512, 1024),
        ("down_3.conv2 10x13x1024->1024", (10, 13), 1024, 1024),
        ("up_0.conv1 20x26x1024->512", (20, 26), 1024, 512),
    ]
    def requant(xf, c):
        # the device_time carry perturbs the INPUT (ab_maxpool_batch1.py
        # pattern): with an invariant input the scan chain hoists the conv
        # out of the loop and times `+c` instead
        return jnp.clip(jnp.round(xf + c), -127, 127).astype(jnp.int8)

    results = {}
    for name, (h, w), cin, cout in blocks:
        xf = jnp.asarray(rng.randint(-127, 128, (1, h, w, cin)).astype(np.float32))
        w8 = jnp.asarray(rng.randint(-127, 128, (3, 3, cin, cout)).astype(np.int8))
        w2d = w_to_2d(w8)

        conv_j = jax.jit(lambda q, k, c: conv_form(requant(q, c), k))
        dot_j = jax.jit(lambda q, k, c: im2col_form(requant(q, c), k))
        a = np.asarray(conv_j(xf, w8, jnp.float32(0)))
        b = np.asarray(dot_j(xf, w2d, jnp.float32(0)))
        assert np.array_equal(a, b), f"{name}: formulations disagree"

        # explicit iters: skips the auto-scale pilot compiles (the tunneled
        # compiler is the expensive part of this experiment, not the chip)
        tc = device_time(conv_j, xf, w8, iters=2048, repeats=5)
        td = device_time(dot_j, xf, w2d, iters=2048, repeats=5)
        wbytes = w8.size
        print(f"{name:>34}: conv {tc*1e6:8.1f} us ({wbytes/tc/1e9:6.1f} GB/s wt) | "
              f"dot {td*1e6:8.1f} us ({wbytes/td/1e9:6.1f} GB/s wt) | "
              f"dot/conv {td/tc:.3f}x")
        results[name] = (tc, td)

    # the deep tower end to end: pool -> dc(down_2) -> pool -> dc(down_3)
    # with fresh weights per conv, mimicking the real graph's staging load
    def tower(form, weights, xf, c):
        h = requant(xf, c)
        for (w_or_2d,) in weights:
            h = form(h, w_or_2d)
            h = jnp.clip(h >> 8, -127, 127).astype(jnp.int8)  # stand-in requant
        return h
    specs = [(256, 512), (512, 512), (512, 1024), (1024, 1024)]
    ws = [jnp.asarray(rng.randint(-127, 128, (3, 3, ci, co)).astype(np.int8))
          for ci, co in specs]
    x0 = jnp.asarray(rng.randint(-127, 128, (1, 20, 26, 256)).astype(np.float32))
    tower_conv = jax.jit(lambda x, c, *w: tower(conv_form, [(wi,) for wi in w], x, c))
    tower_dot = jax.jit(lambda x, c, *w: tower(im2col_form, [(w_to_2d(wi),) for wi in w], x, c))
    a = np.asarray(tower_conv(x0, jnp.float32(0), *ws))
    b = np.asarray(tower_dot(x0, jnp.float32(0), *ws))
    assert np.array_equal(a, b), "tower formulations disagree"
    tc = device_time(lambda x, c: tower_conv(x, c, *ws), x0, iters=1024, repeats=5)
    td = device_time(lambda x, c: tower_dot(x, c, *ws), x0, iters=1024, repeats=5)
    wbytes = sum(wi.size for wi in ws)
    print(f"{'deep tower (4 convs, 16.5 MB wt)':>34}: conv {tc*1e6:8.1f} us "
          f"({wbytes/tc/1e9:6.1f} GB/s wt) | dot {td*1e6:8.1f} us "
          f"({wbytes/td/1e9:6.1f} GB/s wt) | dot/conv {td/tc:.3f}x")


if __name__ == "__main__":
    main()
