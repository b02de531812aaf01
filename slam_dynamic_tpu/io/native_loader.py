"""ctypes bridge to the native prefetching PNG loader (native/dataloader.cpp).

Falls back to PIL transparently when the shared library isn't built
(`sh native/build.sh` builds it). The loader decodes ahead of the consumer
with a worker pool + bounded ring, emitting frames in order.
"""
from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                         "lib", "libslamloader.so")
_lib = None


def _load_lib():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.slam_loader_open.restype = ctypes.c_void_p
        lib.slam_loader_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.slam_loader_next.restype = ctypes.c_int
        lib.slam_loader_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_longlong]
        lib.slam_loader_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


class PrefetchingLoader:
    """Iterate PNG files as numpy arrays with background decoding.

    Yields camera-native uint8 [H, W] for 8-bit files and uint16 [H, W]
    for 16-bit (TUM depth) files. A frame that fails to decode or exceeds
    `max_hw` raises IOError naming the offending path (NOT silent
    end-of-stream — silently truncating a dataset desyncs timestamps).
    """

    def __init__(self, paths: List[str], n_threads: int = 3,
                 capacity: int = 8, max_hw=(2048, 2048)):
        self.paths = list(paths)
        self._lib = _load_lib()
        self._handle = None
        self._max_hw = max_hw
        if self._lib is not None:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths])
            self._handle = self._lib.slam_loader_open(
                arr, len(self.paths), n_threads, capacity)

    def __iter__(self):
        if self._handle is None:
            from PIL import Image
            for p in self.paths:
                img = Image.open(p)
                a = np.asarray(img)
                if a.ndim == 3:
                    a = np.asarray(img.convert("L"))
                yield (a if a.dtype == np.uint8
                       else a.astype(np.uint16))
            return
        H, W = self._max_hw
        buf_8 = np.empty(H * W, np.uint8)
        buf_u = np.empty(H * W, np.uint16)
        w = ctypes.c_int()
        h = ctypes.c_int()
        try:
            for i in range(len(self.paths)):
                bd = self._lib.slam_loader_next(
                    self._handle,
                    buf_8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    buf_u.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                    ctypes.byref(w), ctypes.byref(h), H * W)
                if bd == 0:
                    break
                if bd == -1:
                    raise IOError(f"failed to decode {self.paths[i]}")
                if bd == -2:
                    raise IOError(
                        f"{self.paths[i]} is {w.value}x{h.value}, larger "
                        f"than loader max_hw={self._max_hw}")
                n = w.value * h.value
                if bd == 8:
                    yield buf_8[:n].reshape(h.value, w.value).copy()
                else:
                    yield buf_u[:n].reshape(h.value, w.value).copy()
        finally:
            self.close()

    def close(self):
        if self._handle is not None:
            self._lib.slam_loader_close(self._handle)
            self._handle = None
