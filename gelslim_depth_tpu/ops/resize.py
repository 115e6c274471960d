"""Area (adaptive-average) resize expressed as two small matmuls.

The reference resizes with ``torch.nn.functional.interpolate(mode='area')``
(ref: processing_utils/image_utils.py:12-15), whose semantics are those of
``adaptive_avg_pool2d``: output pixel ``i`` along an axis of input length
``n_in`` and output length ``n_out`` is the uniform average of input pixels
``[floor(i*n_in/n_out), ceil((i+1)*n_in/n_out))``. The shipped pipeline
downsamples 320x427 -> 160x213, where the 427->213 axis is *not* an integer
factor, so windows alternate between 2 and 3 pixels wide.

TPU-first design: instead of gather/scatter pooling loops we precompute a
static (n_out, n_in) row-stochastic weight matrix per axis at trace time
(pure numpy — shapes are static under jit) and apply the resize as two
dense contractions, which XLA maps straight onto the MXU and fuses with
neighboring elementwise work. This is bit-accurate to adaptive average
pooling for both down- and up-sampling (mode='area' upsampling follows the
same window formula).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

# These resize matmuls are parity-critical (mm-level depth agreement), and
# tiny next to the U-Net convs, so always run them at full f32 MXU precision
# rather than the TPU default bf16 passes.
_EXACT = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=128)
def _area_weight_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Row-stochastic (n_out, n_in) matrix of adaptive-average-pool weights."""
    w = np.zeros((n_out, n_in), dtype=np.float64)
    for i in range(n_out):
        start = (i * n_in) // n_out
        end = -((-(i + 1) * n_in) // n_out)  # ceil((i+1)*n_in/n_out)
        w[i, start:end] = 1.0 / (end - start)
    return w.astype(np.float32)


def area_resize(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Adaptive-average resize of the trailing two spatial dims to ``size``.

    Accepts (..., H, W) arrays — CHW, NCHW, NHW all work. Exactly matches
    torch ``F.interpolate(mode='area')`` / ``adaptive_avg_pool2d``.
    """
    h_in, w_in = x.shape[-2], x.shape[-1]
    h_out, w_out = int(size[0]), int(size[1])
    if (h_in, w_in) == (h_out, w_out):
        return x
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    ah = jnp.asarray(_area_weight_matrix(h_in, h_out))
    aw = jnp.asarray(_area_weight_matrix(w_in, w_out))
    # (..., H_in, W_in) -> (..., H_out, W_in): contract H with A_h.
    y = jnp.einsum("oh,...hw->...ow", ah, xf, precision=_EXACT)
    # (..., H_out, W_in) -> (..., H_out, W_out): contract W with A_w.
    y = jnp.einsum("pw,...ow->...op", aw, y, precision=_EXACT)
    return y.astype(dtype)


def resize(x: jnp.ndarray, size: Tuple[int, int], interp_method: str = "area") -> jnp.ndarray:
    """Resize trailing two dims by the named method.

    'area' is the reference's (and only shipped) method; 'bilinear' and
    'nearest' are provided via jax.image.resize for completeness.
    """
    if interp_method == "area":
        return area_resize(x, size)
    import jax.image

    out_shape = x.shape[:-2] + (int(size[0]), int(size[1]))
    method = {"bilinear": "linear", "nearest": "nearest"}.get(interp_method, interp_method)
    return jax.image.resize(x, out_shape, method=method).astype(x.dtype)


def sample_multi_channel_image_to_desired_size(
    mc_image: jnp.ndarray, desired_size: Tuple[int, int], interp_method: str = "area"
) -> jnp.ndarray:
    """Name-compatible alias for the reference API
    (ref: processing_utils/image_utils.py:12)."""
    return resize(mc_image, desired_size, interp_method)
