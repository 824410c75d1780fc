"""ctypes loader for the native COCO-eval matching kernel.

Compiles ``native/cocoeval.cc`` lazily into a shared library (cached next to
the source) and exposes numpy-friendly wrappers.  Degrades to ``None`` when
no C++ toolchain is available — the evaluator falls back to its numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "cocoeval.cc")
_LIB = os.path.join(_REPO_ROOT, "native", "libcocoeval.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    for cxx in ("g++", "clang++", "c++"):
        try:
            subprocess.run(
                [cxx, "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
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
        except OSError:
            return None
        c_d = ctypes.POINTER(ctypes.c_double)
        c_u8 = ctypes.POINTER(ctypes.c_uint8)
        lib.iou_matrix.argtypes = [c_d, ctypes.c_int, c_d, ctypes.c_int, c_u8, c_d]
        lib.iou_matrix.restype = None
        lib.match_detections.argtypes = [
            c_d, ctypes.c_int, ctypes.c_int, c_u8, c_u8, c_d, ctypes.c_int, c_u8, c_u8,
        ]
        lib.match_detections.restype = None
        _lib = lib
        return _lib


def _ptr_d(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _ptr_u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def iou_matrix(dets: np.ndarray, gts: np.ndarray, iscrowd: np.ndarray) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    dets = np.ascontiguousarray(dets, np.float64)
    gts = np.ascontiguousarray(gts, np.float64)
    crowd = np.ascontiguousarray(iscrowd, np.uint8)
    out = np.zeros((len(dets), len(gts)), np.float64)
    lib.iou_matrix(_ptr_d(dets), len(dets), _ptr_d(gts), len(gts), _ptr_u8(crowd), _ptr_d(out))
    return out


def match_detections(
    ious: np.ndarray,
    gt_iscrowd: np.ndarray,
    gt_ignore: np.ndarray,
    thresholds: np.ndarray,
) -> Optional[tuple[np.ndarray, np.ndarray]]:
    lib = load()
    if lib is None or ious.shape[1] >= 4096:
        return None
    n_det, n_gt = ious.shape
    n_thr = len(thresholds)
    ious = np.ascontiguousarray(ious, np.float64)
    crowd = np.ascontiguousarray(gt_iscrowd, np.uint8)
    ignore = np.ascontiguousarray(gt_ignore, np.uint8)
    thr = np.ascontiguousarray(thresholds, np.float64)
    matched = np.zeros((n_thr, n_det), np.uint8)
    matched_ign = np.zeros((n_thr, n_det), np.uint8)
    lib.match_detections(
        _ptr_d(ious), n_det, n_gt, _ptr_u8(crowd), _ptr_u8(ignore),
        _ptr_d(thr), n_thr, _ptr_u8(matched), _ptr_u8(matched_ign),
    )
    return matched.astype(bool), matched_ign.astype(bool)
