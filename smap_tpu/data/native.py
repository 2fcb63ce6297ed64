"""ctypes binding for the native preprocessing library.

Builds ``native/preprocess.cc`` with g++ on first use (cached as a shared
object next to the source) and exposes fused letterbox+normalize. Falls
back to the cv2/numpy path transparently when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional, Tuple

import numpy as np

from smap_tpu.config import INPUT_SHAPE, PIXEL_MEANS_BGR, PIXEL_STDS_BGR
from smap_tpu.camera import default_scale_dict

_REPO_ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "preprocess.cc")
_SO = os.path.join(_REPO_ROOT, "native", "libsmap_preprocess.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-o", _SO, _SRC],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            lib.letterbox_normalize.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float)]
            lib.normalize_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float)]
            _lib = lib
        except (OSError, subprocess.CalledProcessError):
            _failed = True
        return _lib


def native_available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def normalize_native(img_bgr_u8: np.ndarray) -> np.ndarray:
    """One-pass uint8 BGR -> normalized float32 (numpy fallback inside)."""
    lib = _load()
    if lib is None:
        from smap_tpu.data.preprocess import normalize_image
        return normalize_image(img_bgr_u8)
    src = np.ascontiguousarray(img_bgr_u8, np.uint8)
    h, w = src.shape[:2]
    out = np.empty((h, w, 3), np.float32)
    mean = np.asarray(PIXEL_MEANS_BGR, np.float32)
    std = np.asarray(PIXEL_STDS_BGR, np.float32)
    lib.normalize_u8(src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                     h, w, _fptr(out), _fptr(mean), _fptr(std))
    return out


def letterbox_normalize_native(img_bgr: np.ndarray,
                               net_hw: Tuple[int, int] = INPUT_SHAPE
                               ) -> Tuple[np.ndarray, Dict[str, float]]:
    """Fused letterbox + normalize; mirrors data.preprocess.letterbox_image
    followed by normalize_image. Falls back to python when unavailable."""
    lib = _load()
    net_h, net_w = net_hw
    img_h, img_w = img_bgr.shape[:2]
    scale = default_scale_dict(img_w, img_h, net_w, net_h)
    if lib is None:
        from smap_tpu.data.preprocess import letterbox_image, normalize_image
        boxed, sc = letterbox_image(img_bgr, net_hw)
        return normalize_image(boxed), sc
    src = np.ascontiguousarray(img_bgr, np.uint8)
    out = np.empty((net_h, net_w, 3), np.float32)
    mean = np.asarray(PIXEL_MEANS_BGR, np.float32)
    std = np.asarray(PIXEL_STDS_BGR, np.float32)
    lib.letterbox_normalize(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img_h, img_w, _fptr(out), net_h, net_w, _fptr(mean), _fptr(std))
    return out, scale
