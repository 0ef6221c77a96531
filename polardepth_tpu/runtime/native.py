"""ctypes bindings for the native ingest runtime (io_loader.cc)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = os.path.join(_DIR, "libpolardepth_io.so")
_handle = None


def build(force: bool = False) -> str:
    """Compile the shared library (idempotent)."""
    if force or not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB)
            < os.path.getmtime(os.path.join(_DIR, "io_loader.cc"))):
        subprocess.run(["make", "-s", "-C", _DIR], check=True)
    return _LIB


def _load():
    global _handle
    if _handle is None:
        lib = ctypes.CDLL(build())
        lib.pd_png_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.pd_png_info.restype = ctypes.c_int
        lib.pd_png_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_long]
        lib.pd_png_decode.restype = ctypes.c_int
        lib.pd_png_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
            ctypes.c_int]
        lib.pd_png_decode_batch.restype = ctypes.c_int
        _handle = lib
    return _handle


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


class NativePngDecoder:
    """Decode PNGs (8-bit gray/RGB, 16-bit gray) into numpy arrays using the
    native thread pool."""

    def __init__(self, nthreads: int = 8):
        self.lib = _load()
        self.nthreads = nthreads

    def info(self, path: str):
        w = ctypes.c_int()
        h = ctypes.c_int()
        ch = ctypes.c_int()
        depth = ctypes.c_int()
        rc = self.lib.pd_png_info(path.encode(), ctypes.byref(w),
                                  ctypes.byref(h), ctypes.byref(ch),
                                  ctypes.byref(depth))
        if rc:
            raise IOError(f"pd_png_info({path}) -> {rc}")
        return h.value, w.value, ch.value, depth.value

    def decode(self, path: str) -> np.ndarray:
        h, w, ch, depth = self.info(path)
        dtype = np.uint16 if depth == 16 else np.uint8
        out = np.empty((h, w, ch) if ch > 1 else (h, w), dtype)
        rc = self.lib.pd_png_decode(
            path.encode(), out.ctypes.data_as(ctypes.c_void_p), out.nbytes)
        if rc:
            raise IOError(f"pd_png_decode({path}) -> {rc}")
        return out

    def decode_batch(self, paths: Sequence[str],
                     shape_hw: tuple[int, int], channels: int,
                     depth_bits: int = 8) -> np.ndarray:
        """Decode same-shaped PNGs concurrently into one stacked array of
        shape (N, H, W[, C])."""
        n = len(paths)
        h, w = shape_hw
        dtype = np.uint16 if depth_bits == 16 else np.uint8
        shape = (n, h, w, channels) if channels > 1 else (n, h, w)
        out = np.empty(shape, dtype)
        itemsize = out.itemsize * h * w * channels
        c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        offsets = (ctypes.c_long * n)(*[i * itemsize for i in range(n)])
        sizes = (ctypes.c_long * n)(*([itemsize] * n))
        rc = self.lib.pd_png_decode_batch(
            c_paths, n, out.ctypes.data_as(ctypes.c_void_p), offsets, sizes,
            self.nthreads)
        if rc:
            raise IOError(f"pd_png_decode_batch -> {rc}")
        return out
