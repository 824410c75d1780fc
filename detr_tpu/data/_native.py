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
    # -march=native matters: the resize/normalize kernels are memory/SIMD
    # bound and auto-vectorize (AVX2/AVX-512) only when the ISA is enabled;
    # fall back to portable codegen where the flag is unsupported.
    # Compile into a per-pid temp file and atomically rename: spawn-pool
    # workers lazy-build concurrently, and two compilers writing _LIB
    # directly could interleave into a corrupt library.
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    for cxx in ("g++", "clang++", "c++"):
        for extra in (
            ["-fopenmp", "-march=native"],
            ["-fopenmp"],
            ["-march=native"],
            [],
        ):
            try:
                subprocess.run(
                    [cxx, "-O3", "-shared", "-fPIC", *extra, "-o", tmp, _SRC],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
                os.replace(tmp, _LIB)
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
            lib.resize_bilinear_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
                ctypes.c_int,
            ]
            lib.affine_gray_f32.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_long,
                ctypes.c_float,
                ctypes.c_float,
                ctypes.c_float,
            ]
            lib.gray_mean_f32.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_long,
            ]
            lib.gray_mean_f32.restype = ctypes.c_double
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


def resize_bilinear(img: np.ndarray, nh: int, nw: int) -> Optional[np.ndarray]:
    """Antialiased bilinear resize of a uint8 HWC3 image (the PIL BILINEAR /
    torchvision antialias=True algorithm in float32); None when the kernel
    is unavailable or the input isn't uint8 HWC3."""
    lib = load()
    if (
        lib is None
        or img.dtype != np.uint8
        or img.ndim != 3
        or img.shape[2] != 3
        or nh <= 0
        or nw <= 0
    ):
        return None
    src = np.ascontiguousarray(img)
    out = np.empty((nh, nw, 3), np.uint8)
    lib.resize_bilinear_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(src.shape[0]),
        ctypes.c_int(src.shape[1]),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(nh),
        ctypes.c_int(nw),
    )
    return out


def affine_gray(
    img_f: np.ndarray, alpha: float, beta: float, gamma: float
) -> Optional[np.ndarray]:
    """clip(alpha*img + beta*gray(img) + gamma, 0, 255) in one pass on
    float32 (..., 3); None when the kernel is unavailable."""
    lib = load()
    if lib is None or img_f.dtype != np.float32 or img_f.shape[-1] != 3:
        return None
    src = np.ascontiguousarray(img_f)
    out = np.empty(src.shape, np.float32)
    lib.affine_gray_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_long(src.size // 3),
        ctypes.c_float(float(alpha)),
        ctypes.c_float(float(beta)),
        ctypes.c_float(float(gamma)),
    )
    return out


def gray_mean(img_f: np.ndarray) -> Optional[float]:
    """Mean ITU-R 601 gray of float32 (..., 3); None when unavailable."""
    lib = load()
    if lib is None or img_f.dtype != np.float32 or img_f.shape[-1] != 3:
        return None
    src = np.ascontiguousarray(img_f)
    return float(
        lib.gray_mean_f32(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_long(src.size // 3),
        )
    )


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
