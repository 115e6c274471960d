"""Stateless tensor ops (TPU-first rebuild of the reference's processing_utils).

Every function here is a pure jittable jnp function operating on CHW / NCHW
arrays (channel at axis -3), mirroring the reference's public op surface:

- image.get_difference_image          (ref: processing_utils/image_utils.py:6)
- resize.area_resize / resize.resize  (ref: processing_utils/image_utils.py:12)
- image.gaussian_blur                 (ref: processing_utils/image_utils.py:17)
- normalize.normalize_tactile_image / denormalize_tactile_image
                                      (ref: processing_utils/normalization_utils.py:4,37)
- normalize.normalize_depth_image / denormalize_depth_image
                                      (ref: processing_utils/normalization_utils.py:70,101)
"""

from gelslim_depth_tpu.ops.image import get_difference_image, gaussian_blur, blur_depth_images
from gelslim_depth_tpu.ops.resize import area_resize, resize, sample_multi_channel_image_to_desired_size
from gelslim_depth_tpu.ops.normalize import (
    normalize_tactile_image,
    denormalize_tactile_image,
    normalize_depth_image,
    denormalize_depth_image,
    image_norm_coeffs,
    depth_norm_coeffs,
)

__all__ = [
    "get_difference_image",
    "gaussian_blur",
    "blur_depth_images",
    "area_resize",
    "resize",
    "sample_multi_channel_image_to_desired_size",
    "normalize_tactile_image",
    "denormalize_tactile_image",
    "normalize_depth_image",
    "denormalize_depth_image",
    "image_norm_coeffs",
    "depth_norm_coeffs",
]
