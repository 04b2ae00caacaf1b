"""ctypes bridge to the native evaluation core (native/edt.cpp).

Builds ``libdmt_native.so`` on first use (g++ via the Makefile) and falls
back to NumPy/SciPy when a compiler is unavailable. The exposed surface:

- :func:`distance_map` — exact EDT to the foreground of a bool mask
  (reference backend: scipy distance_transform_edt / cv2 distanceTransform,
  eval_iou_noise.py:162-182);
- :func:`pair_counts` — one-pass per-pair counters (inter, union, areas,
  fp, far-noise count, gaussian recall numerator);
- :func:`binarize_bytes` — thresholded binarization.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdmt_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        # (re)build when the library is missing OR older than its source —
        # a stale binary must never shadow edt.cpp (the .so is gitignored,
        # never committed)
        src = os.path.join(_NATIVE_DIR, "edt.cpp")
        stale = (not os.path.exists(_LIB_PATH)) or (
            os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
        )
        if stale:
            try:
                subprocess.run(
                    ["make", "-s", "-B"], cwd=os.path.abspath(_NATIVE_DIR),
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(os.path.abspath(_LIB_PATH))
            lib.edt2d.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.mask_metrics.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int, ctypes.c_double,
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.binarize.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ]
            _lib = lib
        except Exception:
            _build_failed = True
        return _lib


def backend() -> str:
    """'native' when the C++ core is loadable, else 'scipy'."""
    return "native" if _load() is not None else "scipy"


def _as_u8(mask: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(mask, dtype=np.uint8)


def distance_map(mask: np.ndarray) -> np.ndarray:
    """Euclidean distance of every pixel to the nearest True pixel of
    ``mask`` (True pixels → 0). Empty mask → +inf everywhere."""
    mask = np.asarray(mask)
    h, w = mask.shape
    lib = _load()
    if lib is not None:
        m = _as_u8(mask)
        out = np.empty((h, w), dtype=np.float64)
        lib.edt2d(
            m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return out
    from scipy.ndimage import distance_transform_edt

    if not mask.any():
        return np.full((h, w), np.inf)
    return distance_transform_edt(~mask.astype(bool)).astype(np.float64)


def pair_counts(gt: np.ndarray, pred: np.ndarray, sigma: float) -> dict:
    """Raw counters for one GT/pred pair (see edt.cpp mask_metrics)."""
    gt = np.asarray(gt).astype(bool)
    pred = np.asarray(pred).astype(bool)
    if gt.shape != pred.shape:
        raise ValueError(f"Shape mismatch: gt{gt.shape} vs pred{pred.shape}")
    h, w = gt.shape
    lib = _load()
    if lib is not None:
        out = np.empty(7, dtype=np.float64)
        lib.mask_metrics(
            _as_u8(gt).ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            _as_u8(pred).ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            h, w, float(sigma),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        keys = ("inter", "union", "gt_area", "pred_area", "fp",
                "far_noise", "gauss_sum")
        return dict(zip(keys, out.tolist()))

    inter = np.logical_and(gt, pred).sum(dtype=np.int64)
    union = np.logical_or(gt, pred).sum(dtype=np.int64)
    gt_area = int(gt.sum())
    pred_area = int(pred.sum())
    fp = np.logical_and(pred, ~gt).sum(dtype=np.int64)
    far_noise, gauss_sum = 0, 0.0
    if pred_area > 0 and gt_area > 0:
        dist = distance_map(gt)
        far_noise = int(np.logical_and(pred, dist > sigma).sum())
        gauss_sum = float(
            (pred * np.exp(-(dist ** 2) / (2.0 * sigma ** 2))).sum()
        )
    elif pred_area > 0:
        far_noise = pred_area
    return {
        "inter": float(inter), "union": float(union),
        "gt_area": float(gt_area), "pred_area": float(pred_area),
        "fp": float(fp), "far_noise": float(far_noise),
        "gauss_sum": gauss_sum,
    }


def binarize_bytes(arr: np.ndarray, threshold: int, invert: bool) -> np.ndarray:
    """Grayscale uint8 array → bool mask (eval_iou_noise.py:77-94)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    lib = _load()
    if lib is not None:
        out = np.empty(arr.size, dtype=np.uint8)
        lib.binarize(
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), arr.size,
            int(threshold), int(bool(invert)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out.reshape(arr.shape).astype(bool)
    return (arr < threshold) if invert else (arr >= threshold)
