"""ctypes bindings for the native data-loader (native/pcd_native.cpp).

Builds the shared library on first use (g++, ~1 s) and caches it next to
the source.  Everything here is optional: io.pcd falls back to the pure
numpy/python path when the toolchain or the build is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libpcd_native.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        if not os.path.exists(_SO_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(_SO_PATH)
        lib.lzf_decompress.restype = ctypes.c_size_t
        lib.lzf_decompress.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t]
        lib.pcd_read_xyz.restype = ctypes.c_long
        lib.pcd_read_xyz.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long]
        lib.pcd_read_batch.restype = None
        lib.pcd_read_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_long,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_long),
            ctypes.c_long, ctypes.c_int]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def lzf_decompress(data: bytes, expected_length: int) -> bytes:
    lib = _load()
    if lib is None:
        from lidar_slam_arvc_tpu.io.pcd import lzf_decompress_py
        return lzf_decompress_py(data, expected_length)
    out = np.empty(expected_length, dtype=np.uint8)
    n = lib.lzf_decompress(
        data, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        expected_length)
    return out[:n].tobytes()


def read_pcd_xyz(path: str, capacity: int) -> np.ndarray | None:
    """(n, 3) float32 xyz, or None if native path can't handle the file."""
    lib = _load()
    if lib is None:
        return None
    buf = np.empty((capacity, 3), dtype=np.float32)
    n = lib.pcd_read_xyz(path.encode(),
                         buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                         capacity)
    if n < 0:
        return None  # ascii or parse error: python fallback
    return buf[:n].copy()


def read_pcd_batch(paths: list[str], capacity: int,
                   n_threads: int | None = None):
    """Threaded batch read -> (points (B, capacity, 3), counts (B,)).

    counts[i] < 0 flags files the native parser rejected (caller falls back
    per-file).
    """
    lib = _load()
    if lib is None:
        return None
    if n_threads is None:
        n_threads = min(8, os.cpu_count() or 1)
    b = len(paths)
    out = np.zeros((b, capacity, 3), dtype=np.float32)
    counts = np.zeros(b, dtype=np.int64)
    arr = (ctypes.c_char_p * b)(*[p.encode() for p in paths])
    lib.pcd_read_batch(arr, b,
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                       counts.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
                       capacity, n_threads)
    return out, counts
