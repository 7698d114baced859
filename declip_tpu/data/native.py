"""ctypes bindings for the native fastload library (native/fastload.cc).

Provides the C++ data-path primitives (the reference delegates these to
NVIDIA DALI, SURVEY.md §2.9): JSONL offset scanning, JPEG decode with DCT
prescale, fused decode+crop+bilinear-resize. Auto-builds the .so on first use
if a compiler is available; everything degrades gracefully to the PIL path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libfastload.so")

_lib = None
_tried = False
_load_lock = threading.Lock()


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _load_lock:
        if _lib is not None or _tried:  # raced with another loader thread
            return _lib
        return _load_locked()


def _load_locked() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    _tried = True
    if not os.path.exists(_SO_PATH):
        src = os.path.join(_NATIVE_DIR, "fastload.cc")
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(
                ["bash", os.path.join(_NATIVE_DIR, "build.sh")],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.fl_scan_offsets.restype = ctypes.c_int64
    lib.fl_scan_offsets.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_int64))]
    lib.fl_free.argtypes = [ctypes.c_void_p]
    lib.fl_jpeg_dims.restype = ctypes.c_int
    lib.fl_jpeg_dims.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.fl_jpeg_decode.restype = ctypes.c_int
    lib.fl_jpeg_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.fl_decode_crop_resize.restype = ctypes.c_int
    lib.fl_decode_crop_resize.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def scan_offsets(path: str) -> np.ndarray:
    """Byte offsets of each non-empty line (JSONL fseek index)."""
    lib = _load()
    assert lib is not None, "native fastload unavailable"
    out = ctypes.POINTER(ctypes.c_int64)()
    n = lib.fl_scan_offsets(path.encode(), ctypes.byref(out))
    if n < 0:
        raise OSError(f"fl_scan_offsets failed for {path}")
    try:
        return np.ctypeslib.as_array(out, shape=(n,)).copy() if n else \
            np.zeros((0,), np.int64)
    finally:
        if out:  # guard on the pointer, not the count
            lib.fl_free(out)


def jpeg_dims(data: bytes) -> Tuple[int, int]:
    lib = _load()
    assert lib is not None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.fl_jpeg_dims(data, len(data), ctypes.byref(w),
                        ctypes.byref(h)) != 0:
        raise ValueError("not a decodable JPEG")
    return w.value, h.value


def decode_jpeg(data: bytes, min_side: int = 0) -> np.ndarray:
    """JPEG bytes -> RGB uint8 [H, W, 3] (DCT-prescaled if min_side set)."""
    lib = _load()
    assert lib is not None
    buf = ctypes.POINTER(ctypes.c_uint8)()
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.fl_jpeg_decode(data, len(data), min_side, ctypes.byref(buf),
                            ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise ValueError("JPEG decode failed")
    try:
        arr = np.ctypeslib.as_array(buf, shape=(h.value, w.value, 3)).copy()
    finally:
        lib.fl_free(buf)
    return arr


def decode_crop_resize(data: bytes, box: Tuple[float, float, float, float],
                       out_size: Tuple[int, int]) -> np.ndarray:
    """Fused decode + crop(box=(x, y, w, h)) + bilinear resize -> uint8
    [oh, ow, 3]."""
    lib = _load()
    assert lib is not None
    ow, oh = out_size
    out = np.empty((oh, ow, 3), np.uint8)
    rc = lib.fl_decode_crop_resize(
        data, len(data), box[0], box[1], box[2], box[3],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), ow, oh)
    if rc != 0:
        raise ValueError("decode_crop_resize failed")
    return out
