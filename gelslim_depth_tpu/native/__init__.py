"""Native (C++) runtime components, consumed through ctypes.

Build happens lazily on first use (g++ -O3 -shared) with the artifact
cached next to the source; every consumer must degrade gracefully to the
pure-Python path when no compiler is available.
"""

from gelslim_depth_tpu.native.build import load_library, native_available

__all__ = ["load_library", "native_available"]
