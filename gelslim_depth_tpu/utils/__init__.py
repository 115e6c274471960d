from gelslim_depth_tpu.utils.profiling import StepTimer, device_time, trace
from gelslim_depth_tpu.utils.cache import enable_compilation_cache, pin_platform

__all__ = ["StepTimer", "device_time", "trace", "enable_compilation_cache",
           "pin_platform"]
