from gelslim_depth_tpu.utils.profiling import StepTimer, device_time, trace

__all__ = ["StepTimer", "device_time", "trace"]
