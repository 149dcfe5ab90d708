"""ctypes bindings for the native data-plane (fastload.cpp).

Compiles the shared library on first use (g++ available in the image);
every entry point has a pure-Python fallback so the framework works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libfastload.so")
_SRC = os.path.join(_DIR, "fastload.cpp")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        lib.hd_load_interactions.restype = ctypes.c_int64
        lib.hd_load_interactions.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
        ]
        lib.hd_factorize.restype = ctypes.c_int64
        lib.hd_factorize.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.hd_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def load_interactions(path: str) -> np.ndarray | None:
    """Native TSV/CSV interaction parse -> [n, 2] int64, or None."""
    lib = _load()
    if lib is None:
        return None
    up = ctypes.POINTER(ctypes.c_int64)()
    ip = ctypes.POINTER(ctypes.c_int64)()
    n = lib.hd_load_interactions(path.encode(), ctypes.byref(up), ctypes.byref(ip))
    if n < 0:
        return None
    try:
        if n == 0:
            return np.zeros((0, 2), np.int64)
        u = np.ctypeslib.as_array(up, shape=(n,)).copy()
        i = np.ctypeslib.as_array(ip, shape=(n,)).copy()
        return np.stack([u, i], axis=1)
    finally:
        if n > 0:
            lib.hd_free(up)
            lib.hd_free(ip)


def factorize(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray] | None:
    """First-appearance factorize -> (codes int32, uniques int64), or None."""
    lib = _load()
    if lib is None:
        return None
    vals = np.ascontiguousarray(vals, np.int64)
    n = vals.shape[0]
    codes = np.empty(n, np.int32)
    uniques = np.empty(max(n, 1), np.int64)
    n_unique = lib.hd_factorize(
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        uniques.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if n_unique < 0:
        return None
    return codes, uniques[:n_unique].copy()
