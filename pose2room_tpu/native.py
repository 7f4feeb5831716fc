"""ctypes bindings for the native host-side eval kernels (native/iou.cpp).

Builds the shared library with g++ on first use (cached under
``native/build/``); every entry point has a pure-numpy fallback so the
framework works without a toolchain.  Equality between the two paths is
under test in tests/test_native.py.
"""

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_HERE, "native", "iou.cpp")
_BUILD_DIR = os.path.join(_HERE, "native", "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libp2r_native.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not os.path.isfile(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
            os.makedirs(_BUILD_DIR, exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB_PATH],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.oriented_iou_matrix.argtypes = [
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64, flags="C"),
        ]
        lib.greedy_nms.restype = ctypes.c_int64
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available():
    return _load() is not None


def oriented_iou_matrix(dets, gts):
    """(n,8,3) x (m,8,3) corner sets -> (n,m) oriented IoU (native or numpy)."""
    dets = np.ascontiguousarray(dets, dtype=np.float64)
    gts = np.ascontiguousarray(gts, dtype=np.float64)
    n, m = len(dets), len(gts)
    lib = _load()
    if lib is None:
        from pose2room_tpu.ops.boxes import box3d_iou_oriented

        iou, _ = box3d_iou_oriented(
            dets[:, None, :, :], gts[None, :, :, :], xp=np
        )
        return iou
    out = np.zeros((n, m), dtype=np.float64)
    lib.oriented_iou_matrix(dets, n, gts, m, out)
    return out


def greedy_nms(minmax, scores, threshold, old_type=False, classes=None):
    """Score-sorted greedy NMS (native or numpy). Returns kept indices list."""
    lib = _load()
    if lib is None:
        from pose2room_tpu.ops.nms import nms_axis_aligned

        return nms_axis_aligned(
            np.asarray(minmax, dtype=np.float64),
            np.asarray(scores, dtype=np.float64),
            threshold,
            old_type,
            classes=None if classes is None else np.asarray(classes),
        )
    minmax = np.ascontiguousarray(minmax, dtype=np.float64)
    scores = np.ascontiguousarray(scores, dtype=np.float64)
    k, two_dim = minmax.shape
    picked = np.zeros(k, dtype=np.int64)
    cls_arg = (
        np.ascontiguousarray(classes, dtype=np.float64)
        if classes is not None
        else None
    )
    n = lib.greedy_nms(
        minmax.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cls_arg.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        if cls_arg is not None
        else None,
        ctypes.c_int64(k),
        ctypes.c_int(two_dim // 2),
        ctypes.c_double(threshold),
        ctypes.c_int(1 if old_type else 0),
        picked.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return picked[:n].tolist()
