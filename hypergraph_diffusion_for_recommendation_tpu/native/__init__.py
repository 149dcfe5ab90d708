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
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.hd_sort_pairs.restype = ctypes.c_int64
        lib.hd_sort_pairs.argtypes = [i64p, i64p, ctypes.c_int64, i64p]
        lib.hd_pack_blocked.restype = ctypes.c_int64
        lib.hd_pack_blocked.argtypes = [
            i32p, i32p, f32p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            i32p, f32p, i32p, i32p, i32p,
        ]
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


def sort_pairs(major: np.ndarray, minor: np.ndarray) -> np.ndarray:
    """Stable argsort by (major, minor) — np.lexsort((minor, major))
    semantics. Native LSD radix when available (~10x lexsort at >1M
    edges, the make_adj_pair hot spot); falls back to np.lexsort.
    Keys must be non-negative (graph ids are)."""
    lib = _load()
    n = major.shape[0]
    if lib is None or n < (1 << 16):
        return np.lexsort((minor, major))
    major = np.ascontiguousarray(major, np.int64)
    minor = np.ascontiguousarray(minor, np.int64)
    perm = np.empty(n, np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    rc = lib.hd_sort_pairs(
        major.ctypes.data_as(i64p), minor.ctypes.data_as(i64p), n,
        perm.ctypes.data_as(i64p),
    )
    if rc != 0:
        return np.lexsort((minor, major))
    return perm


def pack_blocked_arrays(rows, cols, vals, nrows: int, eb: int, rb: int):
    """Native single-pass blocked-COO packing (the pallas row-window
    layout). Inputs are the LIVE edges sorted by row; returns
    (cols[nb,eb] i32, vals[nb,eb] f32, local_rows[nb,eb] i32,
    src[nb,eb] i32, wmap[nb] i32) or None when the library is absent."""
    lib = _load()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    vals = np.ascontiguousarray(vals, np.float32)
    n = rows.shape[0]
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    null32 = ctypes.cast(None, i32p)
    nb = lib.hd_pack_blocked(
        rows.ctypes.data_as(i32p), cols.ctypes.data_as(i32p),
        vals.ctypes.data_as(f32p), n, nrows, eb, rb,
        null32, ctypes.cast(None, f32p), null32, null32, null32,
    )
    if nb <= 0:
        return None
    out_cols = np.empty((nb, eb), np.int32)
    out_vals = np.empty((nb, eb), np.float32)
    out_lrows = np.empty((nb, eb), np.int32)
    out_src = np.empty((nb, eb), np.int32)
    out_wmap = np.empty(nb, np.int32)
    nb2 = lib.hd_pack_blocked(
        rows.ctypes.data_as(i32p), cols.ctypes.data_as(i32p),
        vals.ctypes.data_as(f32p), n, nrows, eb, rb,
        out_cols.ctypes.data_as(i32p), out_vals.ctypes.data_as(f32p),
        out_lrows.ctypes.data_as(i32p), out_src.ctypes.data_as(i32p),
        out_wmap.ctypes.data_as(i32p),
    )
    if nb2 != nb:
        return None
    return out_cols, out_vals, out_lrows, out_src, out_wmap


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
