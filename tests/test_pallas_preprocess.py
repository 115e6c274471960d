"""Pallas fused-preprocess kernel parity (interpreter mode on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from gelslim_depth_tpu.ops.pallas.preprocess_kernel import (
    fused_preprocess_dual,
    fused_preprocess_dual_reference,
)

MULT = np.asarray([1 / 255.0, 1 / 255.0, 1 / 255.0], np.float32)
ADD = np.zeros(3, np.float32)


@pytest.mark.parametrize("use_diff", [True, False])
def test_kernel_matches_reference(rng, use_diff):
    frames = jnp.asarray(rng.uniform(0, 255, (3, 6, 64, 86)).astype(np.float32))
    base = jnp.asarray(rng.uniform(0, 255, (6, 64, 86)).astype(np.float32))
    got = fused_preprocess_dual(
        frames, base, MULT, ADD, out_size=(32, 43), use_diff=use_diff, interpret=True
    )
    want = fused_preprocess_dual_reference(
        frames, base, MULT, ADD, out_size=(32, 43), use_diff=use_diff
    )
    assert got.shape == (6, 3, 32, 43)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_kernel_finger_order(rng):
    """Left-finger samples occupy rows [0, N), right rows [N, 2N)."""
    frames = np.zeros((2, 6, 32, 43), np.float32)
    frames[:, 0:3] = 200.0  # left bright
    frames[:, 3:6] = 50.0   # right dark
    base = np.full((6, 32, 43), 100.0, np.float32)
    out = np.asarray(
        fused_preprocess_dual(
            jnp.asarray(frames), jnp.asarray(base), MULT, ADD, out_size=(16, 21), interpret=True
        )
    )
    left_expect = ((200 - 100 + 255) / 2) / 255.0
    right_expect = ((50 - 100 + 255) / 2) / 255.0
    np.testing.assert_allclose(out[:2], left_expect, rtol=1e-5)
    np.testing.assert_allclose(out[2:], right_expect, rtol=1e-5)


def test_nonuniform_channel_coeffs(rng):
    frames = jnp.asarray(rng.uniform(0, 255, (1, 6, 32, 43)).astype(np.float32))
    base = jnp.asarray(rng.uniform(0, 255, (6, 32, 43)).astype(np.float32))
    mult = np.asarray([0.01, 0.02, 0.03], np.float32)
    add = np.asarray([-1.0, 0.5, 2.0], np.float32)
    got = fused_preprocess_dual(frames, base, mult, add, out_size=(16, 21), interpret=True)
    want = fused_preprocess_dual_reference(frames, base, mult, add, out_size=(16, 21))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
