"""ctypes bindings for the native frame-IO runtime (csrc/frameio.cpp).

Multi-threaded libjpeg decode + bilinear resize + normalization for the
bulk host path (MOT17 / CrowdHuman / COCO are JPEG corpora).  Falls back
to cv2 when the shared library has not been built (``make -C csrc``) or
for non-JPEG inputs.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc", "libframeio.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.fio_decode_file.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                    ctypes.c_int, f32p, f32p, f32p]
    lib.fio_decode_file.restype = ctypes.c_int
    lib.fio_decode_batch.argtypes = [ctypes.c_int,
                                     ctypes.POINTER(ctypes.c_char_p),
                                     ctypes.c_int, ctypes.c_int, f32p, f32p,
                                     f32p]
    lib.fio_decode_batch.restype = ctypes.c_int
    lib.fio_image_size.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_int),
                                   ctypes.POINTER(ctypes.c_int)]
    lib.fio_image_size.restype = ctypes.c_int
    lib.fio_pool_create.argtypes = [ctypes.c_int]
    lib.fio_pool_create.restype = ctypes.c_int
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.fio_decode_file_u8.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                       ctypes.c_int, u8p]
    lib.fio_decode_file_u8.restype = ctypes.c_int
    lib.fio_decode_batch_u8.argtypes = [ctypes.c_int,
                                        ctypes.POINTER(ctypes.c_char_p),
                                        ctypes.c_int, ctypes.c_int, u8p]
    lib.fio_decode_batch_u8.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def image_size(path: str) -> Optional[tuple]:
    lib = _load()
    if lib is None:
        return None
    w, h = ctypes.c_int(), ctypes.c_int()
    if lib.fio_image_size(path.encode(), ctypes.byref(w),
                          ctypes.byref(h)) != 0:
        return None
    return int(w.value), int(h.value)


def decode_resize_normalize(path: str, out_w: int, out_h: int,
                            mean, std) -> Optional[np.ndarray]:
    """Decode one JPEG to normalized float32 [out_h, out_w, 3] RGB.
    Returns None on failure (caller falls back to cv2)."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((out_h, out_w, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    rc = lib.fio_decode_file(path.encode(), out_w, out_h, _f32p(mean),
                             _f32p(std), _f32p(out))
    return out if rc == 0 else None


def decode_resize(path: str, out_w: int, out_h: int) -> Optional[np.ndarray]:
    """Decode one JPEG to raw uint8 [out_h, out_w, 3] RGB (device-side
    normalization path — 4x less host->device transfer)."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((out_h, out_w, 3), np.uint8)
    rc = lib.fio_decode_file_u8(
        path.encode(), out_w, out_h,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if rc == 0 else None


def decode_batch_u8(paths: Sequence[str], out_w: int,
                    out_h: int) -> Optional[np.ndarray]:
    """Decode n JPEGs concurrently to [n, out_h, out_w, 3] uint8."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.fio_decode_batch_u8(
        n, arr, out_w, out_h,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if rc == 0 else None


def decode_batch(paths: Sequence[str], out_w: int, out_h: int, mean,
                 std) -> Optional[np.ndarray]:
    """Decode n JPEGs concurrently to [n, out_h, out_w, 3] float32."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    rc = lib.fio_decode_batch(n, arr, out_w, out_h, _f32p(mean), _f32p(std),
                              _f32p(out))
    return out if rc == 0 else None
