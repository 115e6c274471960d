from gelslim_depth_tpu.models.unet import UNetConfig, init_unet, unet_apply, UNet
from gelslim_depth_tpu.models.quantize import (
    QuantizedUNet,
    quantize_unet,
    unet_apply_int8,
)

__all__ = [
    "UNetConfig",
    "init_unet",
    "unet_apply",
    "UNet",
    "QuantizedUNet",
    "quantize_unet",
    "unet_apply_int8",
]
