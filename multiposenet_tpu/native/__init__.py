"""ctypes bindings for the native host library (libmpn_host.so).

Everything here has a pure-numpy twin; the native path is an optional
accelerator for dataloader workers (RLE decode dominates DetectionDataset
items) and host-side fallbacks.  `available()` gates use; `build()` compiles
in-place with the system g++ (no pip/pybind11 needed).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libmpn_host.so")
_lib: Optional[ctypes.CDLL] = None


def build(quiet: bool = True) -> bool:
    """Compile libmpn_host.so with make; returns True on success."""
    try:
        subprocess.run(["make", "-C", _DIR, "lib"], check=True,
                       capture_output=quiet)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)

    lib.mpn_rle_decode.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8)]
    lib.mpn_rle_decode.restype = None

    lib.mpn_rle_counts_from_string.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
    lib.mpn_rle_counts_from_string.restype = ctypes.c_int64

    lib.mpn_cpu_nms.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int64)]
    lib.mpn_cpu_nms.restype = ctypes.c_int64

    lib.mpn_put_gaussian_maps.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float)]
    lib.mpn_put_gaussian_maps.restype = None

    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def rle_counts_from_string_native(s: bytes) -> np.ndarray:
    lib = _load()
    assert lib is not None
    out = np.empty(len(s), np.int64)
    n = lib.mpn_rle_counts_from_string(
        s, len(s), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out[:n]


def rle_decode_native(counts: np.ndarray, h: int, w: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    counts = np.ascontiguousarray(counts, dtype=np.int64)
    out = np.empty((h, w), np.uint8)
    lib.mpn_rle_decode(
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        counts.size, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def cpu_nms_native(sorted_boxes: np.ndarray, thresh: float) -> np.ndarray:
    """(n, 4) score-desc-sorted boxes -> kept indices (into sorted order)."""
    lib = _load()
    assert lib is not None
    boxes = np.ascontiguousarray(sorted_boxes, dtype=np.float32)
    keep = np.empty(len(boxes), np.int64)
    n = lib.mpn_cpu_nms(
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(boxes),
        float(thresh), keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return keep[:n]


def put_gaussian_maps_native(joints: np.ndarray, grid_h: int, grid_w: int,
                             stride: int = 4, sigma: float = 7.0) -> np.ndarray:
    """(P, J, 3) joints -> (grid_h, grid_w, J) heatmaps; numpy-twin of
    ops.heatmap.make_heatmaps_np."""
    lib = _load()
    assert lib is not None
    joints = np.ascontiguousarray(joints, dtype=np.float32)
    p, j = joints.shape[0], joints.shape[1]
    out = np.empty((grid_h, grid_w, j), np.float32)
    lib.mpn_put_gaussian_maps(
        joints.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), p, j,
        grid_h, grid_w, stride, float(sigma),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
