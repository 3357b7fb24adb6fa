"""ctypes bindings for the native C++ loader (native/loader.cpp).

The native loader is the TPU-side equivalent of the reference's C++ ingest
runtime (blocking cv::imread at /root/reference/src/System.cpp:228): a
thread-pool decoder (libpng/libjpeg/PGM) with a bounded in-order ring so disk
I/O and decode overlap device compute. Falls back to the pure-Python path
(PIL) when the shared library hasn't been built (`make -C native`).
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native",
                 "libuwslam_native.so"),
    os.path.join(os.path.dirname(__file__), "libuwslam_native.so"),
]

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            lib = ctypes.CDLL(p)
            lib.uws_decode.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.uws_decode.restype = ctypes.c_int
            lib.uws_loader_create.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
            ]
            lib.uws_loader_create.restype = ctypes.c_void_p
            lib.uws_loader_next.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.uws_loader_next.restype = ctypes.c_int
            lib.uws_loader_destroy.argtypes = [ctypes.c_void_p]
            _lib = lib
            return lib
    return None


def available() -> bool:
    return _load() is not None


MAX_PIXELS = 4096 * 4096


def decode(path: str) -> np.ndarray:
    """Decode one image to float32 grayscale (native; raises on failure)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader not built (make -C native)")
    buf = np.empty(MAX_PIXELS, np.float32)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.uws_decode(
        path.encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        MAX_PIXELS,
        ctypes.byref(w),
        ctypes.byref(h),
    )
    if rc != 0:
        raise IOError(f"native decode failed ({rc}): {path}")
    return buf[: w.value * h.value].reshape(h.value, w.value).copy()


class NativeLoader:
    """In-order multithreaded prefetching image loader.

    Iterate -> (index, float32 image). Decoding of frame i+lookahead proceeds
    while frame i is consumed."""

    def __init__(self, paths: list[str], lookahead: int = 8, threads: int = 2):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader not built (make -C native)")
        self._lib = lib
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._handle = lib.uws_loader_create(
            arr, len(self._paths), lookahead, threads
        )
        self._buf = np.empty(MAX_PIXELS, np.float32)

    def __iter__(self):
        while True:
            idx = ctypes.c_int()
            w = ctypes.c_int()
            h = ctypes.c_int()
            rc = self._lib.uws_loader_next(
                self._handle,
                self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                MAX_PIXELS,
                ctypes.byref(idx),
                ctypes.byref(w),
                ctypes.byref(h),
            )
            if rc == 1:
                return
            if rc < 0:
                raise IOError(f"native loader error {rc} at frame {idx.value}")
            yield idx.value, (
                self._buf[: w.value * h.value]
                .reshape(h.value, w.value)
                .copy()
            )

    def close(self):
        if self._handle:
            self._lib.uws_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
