"""ctypes bindings for the native C++ data loader (native/flvis_io.cpp).

Provides PNG decode + rectification + multi-threaded prefetch so the host
loop overlaps disk/decode with device compute — the role the ROS image
pipeline + nodelet threading plays in the reference.  Falls back cleanly if
the shared library has not been built (`make -C native`); the library is
also built on demand on first use when a toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libflvis_io.so")
_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.flvis_decode_png_gray.restype = ctypes.c_int
    lib.flvis_decode_png_gray.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.flvis_prefetch_create.restype = ctypes.c_void_p
    lib.flvis_prefetch_create.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.flvis_prefetch_next.restype = ctypes.c_int
    lib.flvis_prefetch_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.flvis_prefetch_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def decode_png_gray(path: str) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    max_pixels = 4096 * 3072
    buf = np.empty(max_pixels, np.float32)
    w = ctypes.c_int()
    h = ctypes.c_int()
    ok = lib.flvis_decode_png_gray(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_pixels, ctypes.byref(w), ctypes.byref(h),
    )
    if not ok:
        return None
    return buf[: w.value * h.value].reshape(h.value, w.value).copy()


class StereoPrefetcher:
    """Background-threaded stereo frame loader with optional rectification.

    maps: None, or a pair ((map0_x, map0_y), (map1_x, map1_y)) of (H, W)
    float32 arrays from cv2.initUndistortRectifyMap.
    """

    def __init__(self, paths0, paths1, width, height, maps=None, num_threads=2):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable (build native/ first)")
        self._lib = lib
        self.width = width
        self.height = height
        self.n = len(paths0)
        self._mx = self._my = None
        mx_ptr = my_ptr = None
        if maps is not None:
            (m0x, m0y), (m1x, m1y) = maps
            self._mx = np.ascontiguousarray(
                np.concatenate([m0x.reshape(-1), m1x.reshape(-1)]), np.float32)
            self._my = np.ascontiguousarray(
                np.concatenate([m0y.reshape(-1), m1y.reshape(-1)]), np.float32)
            mx_ptr = self._mx.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            my_ptr = self._my.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        self._handle = lib.flvis_prefetch_create(
            "\n".join(paths0).encode(), "\n".join(paths1).encode(), self.n,
            width, height, mx_ptr, my_ptr, num_threads,
        )
        self._emitted = 0

    def __iter__(self):
        return self

    def __next__(self):
        # rc: 1 = frame, 0 = failed frame (skip, like the cv2 fallback
        # path's `continue`), -1 = end of stream.
        while True:
            if self._emitted >= self.n:
                raise StopIteration
            img0 = np.empty((self.height, self.width), np.float32)
            img1 = np.empty((self.height, self.width), np.float32)
            rc = self._lib.flvis_prefetch_next(
                self._handle,
                img0.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                img1.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            self._emitted += 1
            if rc == 1:
                return img0, img1
            if rc == -1:
                raise StopIteration
            # rc == 0: skip the bad frame and keep going.

    def close(self):
        if self._handle:
            self._lib.flvis_prefetch_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
