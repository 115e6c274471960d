"""ctypes wrapper for the native (C++) depth renderer.

The GT-generation min-splat is random-access bound: XLA scatter AND
gather on TPU serialize to ~150-200M random accesses/s (measured,
docs/PERFORMANCE.md), capping the jitted renderer near 480 samples/s.
The native renderer keeps the two per-finger grids L2-resident and
parallelizes across samples, and — because GT generation is an offline
data-prep pass whose inputs and outputs live host-side in .pt files —
needs no device transfers at all. Same algorithm, same f32 arithmetic;
parity vs the JAX renderer is tested (tests/test_meshgen.py).

Returns None when no compiler/library is available; callers fall back to
the JAX renderer (meshgen/depth_render.py).
"""

from __future__ import annotations

import ctypes
from typing import Optional, Tuple

import numpy as np

from gelslim_depth_tpu.native import load_library


def _lib():
    lib = load_library("meshrender")
    if lib is None:
        return None
    if not getattr(lib, "_configured", False):
        lib.render_depth_batch_native.restype = ctypes.c_int
        lib.render_depth_batch_native.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,   # pc, P
            ctypes.POINTER(ctypes.c_float),                   # poses
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,   # widths, B
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,  # spec
            ctypes.c_int, ctypes.c_int,                       # H, W
            ctypes.c_float, ctypes.c_int,                     # mm_per_pixel, fill_iters
            ctypes.c_int, ctypes.c_int,                       # invert, lr_flip
            ctypes.POINTER(ctypes.c_float),                   # out
            ctypes.c_int,                                     # n_threads
        ]
        lib._configured = True
    return lib


def native_renderer_available() -> bool:
    return _lib() is not None


def render_depth_batch_native(
    pc: np.ndarray,        # (P, 3) mm
    poses: np.ndarray,     # (B, 3) rows (t1, t2, angle); t1/t2 in METERS
    widths: np.ndarray,    # (B,) mm
    *,
    spec,
    image_size: Tuple[int, int] = (320, 427),
    mm_per_pixel: float = 12.0 / 320.0,
    fill_iters: int = 6,
    invert_affine: bool = False,
    lr_flip: bool = False,
    n_threads: int = 0,
) -> Optional[np.ndarray]:
    """Same contract as depth_render.render_depth_batch (meters -> mm x1000
    on the translations, (B, 2, H, W) output, (left, right) channel order
    unless lr_flip). None when the native library is unavailable."""
    lib = _lib()
    if lib is None:
        return None
    pc = np.ascontiguousarray(pc, np.float32)
    poses = np.ascontiguousarray(poses, np.float32).copy()
    poses[:, :2] *= 1000.0  # meters -> mm, matching the JAX path's x1000
    widths = np.ascontiguousarray(widths, np.float32)
    h, w = int(image_size[0]), int(image_size[1])
    out = np.empty((poses.shape[0], 2, h, w), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    rc = lib.render_depth_batch_native(
        pc.ctypes.data_as(fp), pc.shape[0],
        poses.ctypes.data_as(fp),
        widths.ctypes.data_as(fp), poses.shape[0],
        int(spec.perp), int(spec.aligned), int(spec.unaligned), int(spec.multiplier),
        h, w, float(mm_per_pixel), int(fill_iters),
        int(bool(invert_affine)), int(bool(lr_flip)),
        out.ctypes.data_as(fp), int(n_threads),
    )
    if rc != 0:
        return None
    return out
