"""ctypes bindings for the native (C++) components.

The reference ships no native code (SURVEY.md §2: pure Python); this
framework adds a small native runtime where host-side work off the XLA
path benefits: currently batch maze-pool generation
(`native/mazegen.cpp`). Loaded lazily; every native path has a pure-Python
fallback so the package works without a toolchain.

Build: ``make -C native`` (g++, no pybind11 needed — plain C ABI via
ctypes)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "librlenv_native.so")

_lib = None
_load_attempted = False


def _try_build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load_native(build_if_missing: bool = True) -> Optional[ctypes.CDLL]:
    """Load (building on demand) the native library, or None."""
    global _lib, _load_attempted
    if _lib is not None:
        return _lib
    if _load_attempted and not os.path.exists(_LIB_PATH):
        return None
    _load_attempted = True
    if not os.path.exists(_LIB_PATH):
        if not (build_if_missing and _try_build()):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.rlenv_generate_maze_pool.argtypes = [
            ctypes.c_uint64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.rlenv_generate_maze_pool.restype = ctypes.c_int
        _lib = lib
    except OSError:
        return None
    return _lib


def generate_maze_pool_native(seed: int, grid_size: int, count: int,
                              min_open: int) -> Optional[np.ndarray]:
    """bool[count, g, g] wall layouts, or None if the library is absent."""
    lib = load_native()
    if lib is None:
        return None
    out = np.empty((count, grid_size, grid_size), dtype=np.uint8)
    ok = lib.rlenv_generate_maze_pool(
        ctypes.c_uint64(seed), grid_size, count, min_open,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if ok < count:
        # some layouts too cramped even after retries; caller falls back
        return None
    return out.astype(bool)
