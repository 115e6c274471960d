"""Lazy ctypes build/load for the native components."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_CACHE: dict = {}


def _build(name: str) -> Optional[str]:
    src = os.path.join(_DIR, f"{name}.cpp")
    out = os.path.join(_DIR, f"lib{name}.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread", src, "-o", out],
            check=True, capture_output=True, timeout=120,
        )
        return out
    except (OSError, subprocess.SubprocessError):
        return None


def load_library(name: str = "ptloader") -> Optional[ctypes.CDLL]:
    """Compile-if-needed and dlopen a native component; None if impossible."""
    with _LOCK:
        if name in _CACHE:
            return _CACHE[name]
        lib = None
        path = _build(name)
        if path is not None:
            try:
                lib = ctypes.CDLL(path)
            except OSError:
                lib = None
        _CACHE[name] = lib
        return lib


def native_available(name: str = "ptloader") -> bool:
    return load_library(name) is not None
