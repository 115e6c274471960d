"""Difference-image and Gaussian blur ops.

Reference behavior being matched (not ported):
- ``get_difference_image`` re-centers a signed RGB difference into [0, 255]:
  ``((img - base) + 255) / 2``  (ref: processing_utils/image_utils.py:6-10).
- ``blur_depth_images`` applies torchvision's ``gaussian_blur`` with an
  integer kernel size k and the torchvision default sigma
  ``0.3*((k-1)*0.5 - 1) + 0.8`` (ref: processing_utils/image_utils.py:17-19).
  torchvision pads in 'reflect' mode and applies a separable, normalized
  1-D Gaussian along each spatial axis. We reproduce that with two small
  static-weight contractions (VPU-friendly, fusable) rather than a
  depthwise conv loop. k == 1 is the shipped configuration and is an
  identity (kernel [1.0]).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

_EXACT = jax.lax.Precision.HIGHEST


def get_difference_image(tactile_image: jnp.ndarray, base_tactile_image: jnp.ndarray) -> jnp.ndarray:
    """Signed difference re-centered from [-255, 255] into [0, 255]."""
    return (tactile_image - base_tactile_image + 255.0) / 2.0


@functools.lru_cache(maxsize=32)
def _gaussian_kernel_1d(kernel_size: int) -> np.ndarray:
    """torchvision-compatible normalized 1-D Gaussian of odd length k."""
    sigma = 0.3 * ((kernel_size - 1) * 0.5 - 1) + 0.8
    x = np.arange(kernel_size, dtype=np.float64) - (kernel_size - 1) / 2.0
    pdf = np.exp(-0.5 * (x / sigma) ** 2)
    return (pdf / pdf.sum()).astype(np.float32)


def gaussian_blur(x: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Separable Gaussian blur of the trailing two dims, reflect-padded.

    Accepts (..., H, W). kernel_size must be odd; 1 is a no-op.
    """
    k = int(kernel_size)
    if k <= 1:
        return x
    if k % 2 == 0:
        raise ValueError(f"gaussian_blur kernel_size must be odd, got {k}")
    dtype = x.dtype
    kern = jnp.asarray(_gaussian_kernel_1d(k))
    pad = k // 2
    ndim = x.ndim
    pad_h = [(0, 0)] * (ndim - 2) + [(pad, pad), (0, 0)]
    pad_w = [(0, 0)] * (ndim - 2) + [(0, 0), (pad, pad)]
    y = x.astype(jnp.float32)
    # Blur H: reflect-pad then contract a sliding window. Expressed as a
    # banded-matrix contraction so XLA lowers it to one dense matmul.
    y = jnp.pad(y, pad_h, mode="reflect")
    y = jnp.einsum("oh,...hw->...ow", _band_matrix(x.shape[-2], k, kern), y, precision=_EXACT)
    y = jnp.pad(y, pad_w, mode="reflect")
    y = jnp.einsum("pw,...ow->...op", _band_matrix(x.shape[-1], k, kern), y, precision=_EXACT)
    return y.astype(dtype)


@functools.lru_cache(maxsize=64)
def _band_matrix_np(n_out: int, k: int, kern_key: bytes) -> np.ndarray:
    kern = np.frombuffer(kern_key, dtype=np.float32)
    m = np.zeros((n_out, n_out + k - 1), dtype=np.float32)
    for i in range(n_out):
        m[i, i : i + k] = kern
    return m


def _band_matrix(n_out: int, k: int, kern: jnp.ndarray) -> jnp.ndarray:
    kern_np = np.asarray(kern, dtype=np.float32)
    return jnp.asarray(_band_matrix_np(int(n_out), int(k), kern_np.tobytes()))


def blur_depth_images(depth: jnp.ndarray, depth_image_blur_kernel: int) -> jnp.ndarray:
    """Name-compatible alias for the reference API
    (ref: processing_utils/image_utils.py:17)."""
    return gaussian_blur(depth, depth_image_blur_kernel)
