"""ctypes bindings for the native C++ dataset loader (native/dataset_loader.cpp).

The reference's image IO and frame prefetch are C++
(libvis/src/libvis/image_io_libpng.cc, pre_load_thread.cc); this binds the
equivalent native runtime: libpng decode + a background prefetch ring.
Falls back gracefully (callers use cv2) when the shared library has not
been built (native/build.sh).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "libbadslam_loader.so",
)


class _BadslamPng(ctypes.Structure):
    _fields_ = [
        ("handle", ctypes.c_void_p),
        ("width", ctypes.c_int),
        ("height", ctypes.c_int),
        ("channels", ctypes.c_int),
        ("bit_depth", ctypes.c_int),
    ]


_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.badslam_png_open.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(_BadslamPng)]
    lib.badslam_png_open.restype = ctypes.c_int
    lib.badslam_png_data.argtypes = [ctypes.POINTER(_BadslamPng),
                                     ctypes.c_void_p]
    lib.badslam_png_close.argtypes = [ctypes.POINTER(_BadslamPng)]
    lib.badslam_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int]
    lib.badslam_loader_create.restype = ctypes.c_void_p
    lib.badslam_loader_get.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(_BadslamPng)]
    lib.badslam_loader_get.restype = ctypes.c_int
    lib.badslam_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load_lib() is not None


def _png_to_numpy(lib, png: _BadslamPng) -> np.ndarray:
    dtype = np.uint16 if png.bit_depth == 16 else np.uint8
    shape = ((png.height, png.width) if png.channels == 1
             else (png.height, png.width, png.channels))
    buf = np.empty(shape, dtype)
    lib.badslam_png_data(ctypes.byref(png),
                         buf.ctypes.data_as(ctypes.c_void_p))
    lib.badslam_png_close(ctypes.byref(png))
    return buf


def read_png(path: str) -> Optional[np.ndarray]:
    """Decode one PNG (u16 grayscale or u8 RGB) via the native library."""
    lib = _load_lib()
    if lib is None:
        return None
    png = _BadslamPng()
    if not lib.badslam_png_open(path.encode(), ctypes.byref(png)):
        return None
    return _png_to_numpy(lib, png)


class NativePrefetchLoader:
    """Background-prefetching PNG loader over an ordered path list."""

    def __init__(self, paths: List[str], ring: int = 4):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError(
                "native loader not built — run native/build.sh")
        self._lib = lib
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        self._handle = lib.badslam_loader_create(arr, len(paths), ring)
        self._len = len(paths)

    def __len__(self) -> int:
        return self._len

    def get(self, index: int) -> Optional[np.ndarray]:
        png = _BadslamPng()
        if not self._lib.badslam_loader_get(self._handle, index,
                                            ctypes.byref(png)):
            return None
        return _png_to_numpy(self._lib, png)

    def close(self) -> None:
        if self._handle:
            self._lib.badslam_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
