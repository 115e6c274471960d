from gelslim_depth_tpu.models.unet import UNetConfig, init_unet, unet_apply, UNet

__all__ = ["UNetConfig", "init_unet", "unet_apply", "UNet"]
