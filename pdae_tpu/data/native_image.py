"""ctypes binding for the native JPEG decode + triangle resize
(native/image_decode.cpp).

ctypes calls release the GIL, so thread-pool decoding scales with workers
(PIL caps out around 4 workers; see CLAUDE.md).  The resize implements
PIL.Image.BILINEAR's antialiased triangle filter; outputs match PIL within
+/-1 uint8 step (rounding).  Since round 2 this is the DEFAULT decode path
for 3-channel LMDB datasets (``fast_decode: false`` opts out; PIL is the
automatic fallback when the .so is unavailable or the input isn't JPEG).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False
_LOCK = threading.Lock()   # loader workers are threads; build/load once


def _lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOCK:
        if _TRIED:
            return _LIB
        lib = _build_and_load()
        _LIB = lib          # publish before _TRIED so readers never see
        _TRIED = True       # _TRIED=True with a stale _LIB
        return _LIB


def _build_and_load():
    native_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")
    so = os.path.join(native_dir, "libimage_decode.so")
    if not os.path.exists(so):
        # build to a process-unique name, then atomically rename: two
        # PROCESSES racing here never CDLL a half-written .so
        tmp_name = f"libimage_decode.so.build.{os.getpid()}"
        tmp = os.path.join(native_dir, tmp_name)
        try:
            subprocess.run(
                ["make", "-C", native_dir, tmp_name, f"IMAGE_SO={tmp_name}"],
                check=True, capture_output=True, timeout=120)
            if os.path.exists(tmp):
                os.replace(tmp, so)
        except Exception:
            if os.path.exists(tmp):
                os.remove(tmp)
            if not os.path.exists(so):   # maybe another process won the race
                return None
    try:
        lib = ctypes.CDLL(so)
        lib.pdae_jpeg_decode.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.pdae_jpeg_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.pdae_buffer_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
        lib.pdae_resize_triangle.restype = ctypes.c_int
        lib.pdae_resize_triangle.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
        return lib
    except Exception:
        return None


def available() -> bool:
    return _lib() is not None


def decode_jpeg(data: bytes) -> Optional[np.ndarray]:
    """JPEG bytes -> RGB uint8 [H, W, 3]; None if not decodable natively."""
    lib = _lib()
    if lib is None or len(data) < 3 or data[:2] != b"\xff\xd8":
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    ptr = lib.pdae_jpeg_decode(data, len(data), ctypes.byref(w),
                               ctypes.byref(h))
    if not ptr:
        return None
    try:
        buf = ctypes.cast(ptr, ctypes.POINTER(
            ctypes.c_uint8 * (w.value * h.value * 3))).contents
        arr = np.frombuffer(buf, np.uint8).reshape(h.value, w.value, 3).copy()
    finally:
        lib.pdae_buffer_free(ptr)
    return arr


def resize_triangle(img: np.ndarray, size: int) -> np.ndarray:
    """PIL-BILINEAR-style antialiased resize of an RGB uint8 array."""
    lib = _lib()
    assert lib is not None
    img = np.ascontiguousarray(img, np.uint8)
    sh, sw = img.shape[:2]
    if (sh, sw) == (size, size):
        return img
    out = np.empty((size, size, 3), np.uint8)
    rc = lib.pdae_resize_triangle(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), sw, sh,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), size, size)
    if rc != 0:
        raise RuntimeError("native resize failed")
    return out


def load_jpeg_resized(data: bytes, size: int,
                      crop=None) -> Optional[np.ndarray]:
    """Decode -> optional (top, left, h, w) crop -> resize.  None if the
    native path can't handle the input (caller falls back to PIL)."""
    arr = decode_jpeg(data)
    if arr is None:
        return None
    if crop is not None:
        top, left, ch, cw = crop
        arr = arr[top:top + ch, left:left + cw]
    return resize_triangle(arr, size)
