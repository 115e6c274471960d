from gelslim_depth_tpu.ops.pallas.preprocess_kernel import fused_preprocess_dual

__all__ = ["fused_preprocess_dual"]
