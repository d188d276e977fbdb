"""ctypes bindings to the native runtime library (native/rtw_native.cpp).

The reference's image output path is native (zigimg); here the
tone-map + PNG/PPM encode run in C++ when `native/librtw_native.so` is
built (`make native`), with transparent Python fallbacks otherwise.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "librtw_native.so",
)
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.rtw_tonemap.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.c_float,
    ]
    lib.rtw_png_encode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)), ctypes.c_int32,
    ]
    lib.rtw_png_encode.restype = ctypes.c_int64
    lib.rtw_ppm_encode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.rtw_ppm_encode.restype = ctypes.c_int64
    lib.rtw_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def tonemap(accum: np.ndarray, samples_per_pixel: int) -> Optional[np.ndarray]:
    """Native tone map (reference main.zig:395-400); None if lib absent."""
    lib = _load()
    if lib is None:
        return None
    acc = np.ascontiguousarray(accum, dtype=np.float32)
    out = np.empty(acc.shape, dtype=np.uint8)
    lib.rtw_tonemap(
        acc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(acc.size // 3),
        ctypes.c_float(1.0 / samples_per_pixel),
    )
    return out


def _encode(fn, img: np.ndarray, *extra) -> Optional[bytes]:
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    buf = ctypes.POINTER(ctypes.c_uint8)()
    n = fn(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int32(w), ctypes.c_int32(h), ctypes.byref(buf), *extra,
    )
    if n < 0:
        return None
    try:
        return ctypes.string_at(buf, n)
    finally:
        lib.rtw_free(buf)


def png_encode(img: np.ndarray, compression: int = 6) -> Optional[bytes]:
    lib = _load()
    if lib is None:
        return None
    return _encode(lib.rtw_png_encode, img, ctypes.c_int32(compression))


def ppm_encode(img: np.ndarray) -> Optional[bytes]:
    lib = _load()
    if lib is None:
        return None
    return _encode(lib.rtw_ppm_encode, img)
