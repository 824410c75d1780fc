"""ctypes loader for the native image-pipeline kernels (native/image_ops.cc).

Same lazy build-and-cache pattern as detr_tpu/eval/_native.py; degrades to
``None`` when no C++ toolchain is available — transforms fall back to their
numpy implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "image_ops.cc")
_LIB = os.path.join(_REPO_ROOT, "native", "libimage_ops.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    for cxx in ("g++", "clang++", "c++"):
        for omp in (["-fopenmp"], []):
            try:
                subprocess.run(
                    [cxx, "-O3", "-shared", "-fPIC", *omp, "-o", _LIB, _SRC],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
                return _LIB
            except (OSError, subprocess.SubprocessError):
                continue
    return None


def load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
            lib.hue_rotate_f32.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_long,
                ctypes.c_float,
            ]
            lib.normalize_u8_f32.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_long,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
            ]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def hue_rotate(img_f: np.ndarray, delta: float) -> Optional[np.ndarray]:
    """In-place-capable native hue rotate; None if the kernel is unavailable.

    ``img_f`` must be contiguous float32 (..., 3) in [0, 255]; a copy is
    rotated and returned.
    """
    lib = load()
    if lib is None:
        return None
    out = np.ascontiguousarray(img_f, np.float32).copy()
    n_px = out.size // 3
    lib.hue_rotate_f32(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_long(n_px),
        ctypes.c_float(float(delta)),
    )
    return out


def normalize_u8(img: np.ndarray, scale: np.ndarray, bias: np.ndarray) -> Optional[np.ndarray]:
    """img(u8, (...,3)) * scale - bias as float32; None when unavailable."""
    lib = load()
    if lib is None or img.dtype != np.uint8:
        return None
    src = np.ascontiguousarray(img)
    out = np.empty(src.shape, np.float32)
    lib.normalize_u8_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_long(src.size // 3),
        np.ascontiguousarray(scale, np.float32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_float)
        ),
        np.ascontiguousarray(bias, np.float32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_float)
        ),
    )
    return out
