"""ctypes bindings for the native host-image runtime (native/image_ops.cpp).

Auto-builds `native/libmsod_image.so` with g++ on first use (cached); every
entry point has a Python/cv2 fallback, so the pipeline works without a
toolchain. The cv2 implementations in data/augment.py remain the semantic
reference — tests assert the native kernels agree.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libmsod_image.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["bash", str(_NATIVE_DIR / "build.sh")], check=True,
                       capture_output=True, timeout=240)
        return True
    except Exception as e:
        logger.warning(f"native build failed: {e}")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError as e:
        logger.warning(f"native load failed: {e}")
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.msod_jpeg_size.argtypes = [u8p, ctypes.c_long, i32p, i32p]
    lib.msod_jpeg_size.restype = ctypes.c_int
    lib.msod_jpeg_decode.argtypes = [u8p, ctypes.c_long, u8p, ctypes.c_int,
                                     ctypes.c_int]
    lib.msod_jpeg_decode.restype = ctypes.c_int
    for name in ("msod_resize_bilinear", "msod_resize_area"):
        fn = getattr(lib, name)
        fn.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int,
                       ctypes.c_int]
        fn.restype = None
    lib.msod_pad_center.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u8p,
                                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_int, ctypes.c_uint8]
    lib.msod_pad_center.restype = None
    lib.msod_warp_affine.argtypes = [u8p, ctypes.c_int, ctypes.c_int, f64p,
                                     u8p, ctypes.c_int, ctypes.c_int,
                                     ctypes.c_uint8]
    lib.msod_warp_affine.restype = None
    lib.msod_hsv_jitter.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_double, ctypes.c_double,
                                    ctypes.c_double]
    lib.msod_hsv_jitter.restype = None
    _lib = lib
    return _lib


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def available() -> bool:
    return get_lib() is not None


def decode_jpeg(data: bytes) -> Optional[np.ndarray]:
    """JPEG bytes -> HWC RGB uint8, or None when native is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, dtype=np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.msod_jpeg_size(_u8ptr(buf), len(data), ctypes.byref(h),
                          ctypes.byref(w)) != 0:
        return None
    out = np.empty((h.value, w.value, 3), dtype=np.uint8)
    if lib.msod_jpeg_decode(_u8ptr(buf), len(data), _u8ptr(out), h.value,
                            w.value) != 0:
        return None
    return out


def resize(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """Longest-side resize kernel: AREA for downscale, LINEAR for upscale."""
    lib = get_lib()
    assert lib is not None
    img = np.ascontiguousarray(img)
    out = np.empty((dh, dw, 3), dtype=np.uint8)
    fn = lib.msod_resize_area if (dh < img.shape[0]) else lib.msod_resize_bilinear
    fn(_u8ptr(img), img.shape[0], img.shape[1], _u8ptr(out), dh, dw)
    return out


def pad_center(img: np.ndarray, th: int, tw: int, top: int, left: int,
               value: int = 114) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    img = np.ascontiguousarray(img)
    out = np.empty((th, tw, 3), dtype=np.uint8)
    lib.msod_pad_center(_u8ptr(img), img.shape[0], img.shape[1], _u8ptr(out),
                        th, tw, top, left, value)
    return out


def warp_affine(img: np.ndarray, M: np.ndarray, dh: int, dw: int,
                border: int = 114) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    img = np.ascontiguousarray(img)
    M = np.ascontiguousarray(M[:2].reshape(-1), dtype=np.float64)
    out = np.empty((dh, dw, 3), dtype=np.uint8)
    lib.msod_warp_affine(_u8ptr(img), img.shape[0], img.shape[1],
                         M.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                         _u8ptr(out), dh, dw, border)
    return out


def hsv_jitter(img: np.ndarray, rh: float, rs: float, rv: float) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    img = np.ascontiguousarray(img)
    lib.msod_hsv_jitter(_u8ptr(img), img.shape[0], img.shape[1], rh, rs, rv)
    return img
