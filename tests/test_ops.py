"""Golden-value tests for the ops layer against the reference formulas,
computed independently with torch (CPU) where torch provides the primitive
(interpolate(mode='area')) and with hand-derived formulas elsewhere.

Reference semantics under test:
- diff image:      ((img - base) + 255)/2       (image_utils.py:6-10)
- area resize:     F.interpolate(mode='area')   (image_utils.py:12-15)
- gaussian blur:   torchvision TF.gaussian_blur (image_utils.py:17-19)
- normalizations:  normalization_utils.py:4-130
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from gelslim_depth_tpu import ops


def test_difference_image(rng):
    img = rng.uniform(0, 255, (2, 6, 16, 20)).astype(np.float32)
    base = rng.uniform(0, 255, (2, 6, 16, 20)).astype(np.float32)
    got = np.asarray(ops.get_difference_image(jnp.asarray(img), jnp.asarray(base)))
    want = ((img - base) + 255.0) / 2.0
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


@pytest.mark.parametrize(
    "in_size,out_size",
    [
        ((320, 427), (160, 213)),  # the shipped downsample (non-integer W factor)
        ((160, 213), (320, 427)),  # the inference upsample back to native
        ((32, 48), (16, 24)),      # exact integer factor
        ((17, 23), (11, 9)),       # awkward sizes
        ((16, 24), (16, 24)),      # identity
    ],
)
def test_area_resize_matches_torch(rng, in_size, out_size):
    x = rng.uniform(-3, 3, (2, 3) + in_size).astype(np.float32)
    got = np.asarray(ops.area_resize(jnp.asarray(x), out_size))
    want = F.interpolate(torch.from_numpy(x), size=out_size, mode="area").numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_area_resize_3d_input(rng):
    x = rng.uniform(0, 255, (3, 32, 41)).astype(np.float32)
    got = np.asarray(ops.area_resize(jnp.asarray(x), (16, 20)))
    want = F.interpolate(torch.from_numpy(x)[None], size=(16, 20), mode="area")[0].numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _torchvision_gaussian_blur_reference(x: np.ndarray, k: int) -> np.ndarray:
    """Independent numpy/torch reimplementation of torchvision's
    gaussian_blur semantics: reflect pad + separable normalized Gaussian
    with sigma = 0.3*((k-1)*0.5 - 1) + 0.8."""
    sigma = 0.3 * ((k - 1) * 0.5 - 1) + 0.8
    ax = np.arange(k, dtype=np.float64) - (k - 1) / 2.0
    kern = np.exp(-0.5 * (ax / sigma) ** 2)
    kern = (kern / kern.sum()).astype(np.float32)
    t = torch.from_numpy(x)
    n, c, h, w = t.shape
    pad = k // 2
    t = F.pad(t, (pad, pad, pad, pad), mode="reflect")
    kh = torch.from_numpy(kern).view(1, 1, k, 1).repeat(c, 1, 1, 1)
    kw = torch.from_numpy(kern).view(1, 1, 1, k).repeat(c, 1, 1, 1)
    t = F.conv2d(t, kh, groups=c)
    t = F.conv2d(t, kw, groups=c)
    return t.numpy()


@pytest.mark.parametrize("k", [3, 5, 7])
def test_gaussian_blur(rng, k):
    x = rng.uniform(-2, 0, (2, 2, 24, 31)).astype(np.float32)
    got = np.asarray(ops.gaussian_blur(jnp.asarray(x), k))
    want = _torchvision_gaussian_blur_reference(x, k)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gaussian_blur_k1_identity(rng):
    x = rng.uniform(-2, 0, (1, 2, 8, 9)).astype(np.float32)
    got = np.asarray(ops.gaussian_blur(jnp.asarray(x), 1))
    np.testing.assert_array_equal(got, x)


# --- normalization goldens: direct transcriptions of the reference math ---

def _ref_normalize_image(x, method, norm_scale, params):
    if method == "min_max_to_-1_1":
        mins, maxes, _, _ = params
        scale = norm_scale
        bias = (0.5 * (np.asarray(maxes) + np.asarray(mins))).tolist()
        denom = (np.asarray(maxes) - np.asarray(mins)).tolist()
    elif method == "mean_std":
        _, _, means, stds = params
        scale, bias, denom = 1.0, means, stds
    elif method == "0_255_to_-1_1":
        scale, bias, denom = 2.0, [127.5], [255.0]
    elif method == "0_255_to_0_1":
        scale, bias, denom = 1.0, [0.0], [255.0]
    out = np.zeros_like(x)
    c = x.shape[-3]
    for i in range(c):
        b = bias[min(i, len(bias) - 1)]
        d = denom[min(i, len(denom) - 1)]
        out[..., i, :, :] = scale * (x[..., i, :, :] - b) / d
    return out


IMG_PARAMS = ([1.0, 2.0, 3.0], [250.0, 240.0, 230.0], [100.0, 110.0, 120.0], [30.0, 31.0, 32.0])


@pytest.mark.parametrize("method", ops.normalize.IMAGE_NORMALIZATION_METHODS)
@pytest.mark.parametrize("batched", [True, False])
def test_image_normalization_roundtrip(rng, method, batched):
    shape = (4, 3, 10, 12) if batched else (3, 10, 12)
    x = rng.uniform(0, 255, shape).astype(np.float32)
    got = np.asarray(ops.normalize_tactile_image(jnp.asarray(x), method, 0.9, IMG_PARAMS))
    want = _ref_normalize_image(x, method, 0.9, IMG_PARAMS)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    back = np.asarray(ops.denormalize_tactile_image(jnp.asarray(got), method, 0.9, IMG_PARAMS))
    np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-3)


def test_image_normalization_short_param_broadcast(rng):
    """Params shorter than C broadcast with min(i, len-1) (the reference's
    0_255 methods rely on this with single-element lists)."""
    x = rng.uniform(0, 255, (2, 5, 6, 7)).astype(np.float32)
    got = np.asarray(ops.normalize_tactile_image(jnp.asarray(x), "0_255_to_-1_1", None, None))
    want = 2.0 * (x - 127.5) / 255.0
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


DEPTH_PARAMS = (-1.9180814027786255, 0.0, -0.25, 0.42)


@pytest.mark.parametrize("method", ops.normalize.DEPTH_NORMALIZATION_METHODS)
def test_depth_normalization_roundtrip(rng, method):
    x = rng.uniform(-1.9, 0, (4, 1, 10, 12)).astype(np.float32)
    scale = {"min_max_to_-1_1": 0.9, "mean_std": 1.0, "min_max_to_0_1": 0.9, "min_max_to_0_-1": -0.9}[method]
    bias = {
        "min_max_to_-1_1": 0.5 * (DEPTH_PARAMS[1] + DEPTH_PARAMS[0]),
        "mean_std": DEPTH_PARAMS[2],
        "min_max_to_0_1": DEPTH_PARAMS[0],
        "min_max_to_0_-1": DEPTH_PARAMS[0],
    }[method]
    denom = {
        "min_max_to_-1_1": DEPTH_PARAMS[1] - DEPTH_PARAMS[0],
        "mean_std": DEPTH_PARAMS[3],
        "min_max_to_0_1": DEPTH_PARAMS[1] - DEPTH_PARAMS[0],
        "min_max_to_0_-1": DEPTH_PARAMS[1] - DEPTH_PARAMS[0],
    }[method]
    got = np.asarray(ops.normalize_depth_image(jnp.asarray(x), method, 0.9, DEPTH_PARAMS))
    want = scale * (x - bias) / denom
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    back = np.asarray(ops.denormalize_depth_image(jnp.asarray(got), method, 0.9, DEPTH_PARAMS))
    np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-5)


def test_shipped_depth_recipe_range():
    """The shipped recipe (min_max_to_0_-1, norm_scale 0.9, range (-1.918, 0))
    maps depth=min -> 0 and depth=0 -> -0.9 (SURVEY.md section 2, #4)."""
    d = jnp.asarray([[[DEPTH_PARAMS[0]], [0.0]]], dtype=jnp.float32)  # (1,2,1)->C,H,W
    d = d.reshape(1, 1, 2, 1)
    got = np.asarray(
        ops.normalize_depth_image(d, "min_max_to_0_-1", 0.9, (DEPTH_PARAMS[0], 0.0))
    ).ravel()
    np.testing.assert_allclose(got, [0.0, -0.9], atol=1e-6)
