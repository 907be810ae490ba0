"""ctypes bindings for the C++ OKS-NMS host library (csrc/oks_nms.cpp).

The native path (SURVEY.md §2.14 — the reference ships Cython/CUDA NMS) for
the eval pipeline's per-image suppression where instance counts are tiny and
variable. Built on demand with g++ (``make -C csrc``); falls back cleanly to
the NumPy oracle in :mod:`rsgnet_tpu.ops.nms` when no compiler exists.
"""
from __future__ import annotations

import ctypes
import threading

import numpy as np

from rsgnet_tpu.utils.native_build import load_native_lib

_LOCK = threading.Lock()
_LIB = None


def get_lib():
    """The loaded library, or None if unavailable (no compiler)."""
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB or None
        lib = load_native_lib("liboks_nms.so", "oks_nms.cpp")
        if lib is None:
            _LIB = False
            return None
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.oks_nms.restype = ctypes.c_int
        lib.oks_nms.argtypes = [f32p, f32p, f32p, f32p, ctypes.c_int,
                                ctypes.c_int, ctypes.c_float, ctypes.c_float,
                                i32p]
        lib.soft_oks_nms.restype = ctypes.c_int
        lib.soft_oks_nms.argtypes = [f32p, f32p, f32p, f32p, ctypes.c_int,
                                     ctypes.c_int, ctypes.c_float,
                                     ctypes.c_float, ctypes.c_int, i32p, f32p]
        _LIB = lib
        return lib


def available() -> bool:
    return get_lib() is not None


def _pack(kpts_db):
    m = len(kpts_db)
    k = np.asarray(kpts_db[0]["keypoints"]).reshape(-1, 3).shape[0]
    kpts = np.ascontiguousarray(
        [np.asarray(d["keypoints"], np.float32).reshape(-1) for d in kpts_db],
        np.float32)
    scores = np.ascontiguousarray([d["score"] for d in kpts_db], np.float32)
    areas = np.ascontiguousarray([d["area"] for d in kpts_db], np.float32)
    return kpts, scores, areas, m, k


def oks_nms_cpp(kpts_db, thresh, sigmas, in_vis_thre=None):
    """Drop-in for :func:`rsgnet_tpu.ops.nms.oks_nms_np`."""
    if len(kpts_db) == 0:
        return []
    lib = get_lib()
    if lib is None:
        from rsgnet_tpu.ops.nms import oks_nms_np
        return oks_nms_np(kpts_db, thresh, sigmas, in_vis_thre)
    kpts, scores, areas, m, k = _pack(kpts_db)
    keep = np.zeros(m, np.int32)
    n = lib.oks_nms(kpts, scores, areas,
                    np.ascontiguousarray(sigmas, np.float32), m, k,
                    float(thresh),
                    -1.0 if in_vis_thre is None else float(in_vis_thre),
                    keep)
    return keep[:n].tolist()


def soft_oks_nms_cpp(kpts_db, thresh, sigmas, in_vis_thre=None, max_dets=20):
    """Drop-in for :func:`rsgnet_tpu.ops.nms.soft_oks_nms_np`."""
    if len(kpts_db) == 0:
        return [], []
    lib = get_lib()
    if lib is None:
        from rsgnet_tpu.ops.nms import soft_oks_nms_np
        return soft_oks_nms_np(kpts_db, thresh, sigmas, in_vis_thre, max_dets)
    kpts, scores, areas, m, k = _pack(kpts_db)
    keep = np.zeros(min(max_dets, m), np.int32)
    new_scores = np.zeros(min(max_dets, m), np.float32)
    n = lib.soft_oks_nms(kpts, scores, areas,
                         np.ascontiguousarray(sigmas, np.float32), m, k,
                         float(thresh),
                         -1.0 if in_vis_thre is None else float(in_vis_thre),
                         int(max_dets), keep, new_scores)
    return keep[:n].tolist(), new_scores[:n]
