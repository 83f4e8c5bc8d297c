"""ctypes bindings for the native host-runtime library (core/native.cpp).

Builds lazily with g++ on first use and caches the .so next to the source;
every entry point has a pure-Python fallback, so the package works without a
toolchain (`native_available()` reports which path is active).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native.cpp")
_SO = os.path.join(_HERE, "libdemnative.so")
_SO_SHA = _SO + ".sha"  # content hash of the source the .so was built from
_lock = threading.Lock()
_lib = None
_tried = False


def _src_hash() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _build(src_hash: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        with open(_SO_SHA, "w") as f:
            f.write(src_hash)
        return True
    except Exception:
        return False


def _so_stale(src_hash: str) -> bool:
    """Rebuild keyed on a content hash (mtimes are unreliable: a git
    checkout gives source and artifact the same mtime, risking a stale
    binary dlopen'd against newer ctypes signatures)."""
    if not os.path.exists(_SO):
        return True
    try:
        with open(_SO_SHA) as f:
            return f.read().strip() != src_hash
    except OSError:
        return True


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src_hash = _src_hash()
        if _so_stale(src_hash):
            if not _build(src_hash):
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        c_char_p = ctypes.c_char_p
        c_i64 = ctypes.c_int64
        c_d = ctypes.c_double
        pd = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        pi = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        p64 = ctypes.POINTER(c_i64)
        lib.demn_write_csv.argtypes = [c_char_p, c_char_p, pd, c_i64, c_i64]
        lib.demn_write_csv.restype = ctypes.c_int
        lib.demn_csv_shape.argtypes = [c_char_p, p64, p64]
        lib.demn_csv_shape.restype = ctypes.c_int
        lib.demn_read_csv.argtypes = [c_char_p, pd, c_i64, c_i64]
        lib.demn_read_csv.restype = ctypes.c_int
        lib.demn_pd_sample.argtypes = [
            pd, pd, c_d, ctypes.c_uint64, ctypes.c_int, pd, c_i64,
        ]
        lib.demn_pd_sample.restype = c_i64
        lib.demn_obj_shape.argtypes = [c_char_p, p64, p64]
        lib.demn_obj_shape.restype = ctypes.c_int
        lib.demn_obj_read.argtypes = [c_char_p, pd, pi, c_i64, c_i64]
        lib.demn_obj_read.restype = ctypes.c_int
        lib.demn_obj_read_normals.argtypes = [c_char_p, pd, c_i64]
        lib.demn_obj_read_normals.restype = ctypes.c_int
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def write_csv_numeric(path: str, header: str, data: np.ndarray) -> bool:
    """Fast numeric CSV write; returns False if native path unavailable."""
    lib = _load()
    if lib is None:
        return False
    data = np.ascontiguousarray(data, np.float64)
    rc = lib.demn_write_csv(
        path.encode(), header.encode(), data, data.shape[0], data.shape[1]
    )
    return rc == 0


def read_csv_numeric(path: str):
    """Fast numeric CSV read -> (header_names, (rows, cols) float64) or
    None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    nr = ctypes.c_int64()
    nc = ctypes.c_int64()
    if lib.demn_csv_shape(path.encode(), ctypes.byref(nr), ctypes.byref(nc)):
        return None
    out = np.empty((nr.value, nc.value), np.float64)
    if lib.demn_read_csv(path.encode(), out, nr.value, nc.value):
        return None
    with open(path) as f:
        header = f.readline().strip().split(",")
    return header, out


def pd_sample(lo, hi, r, seed=0, k_tries=30, max_n=2_000_000):
    """Native Bridson Poisson-disk sampling; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    lo = np.ascontiguousarray(lo, np.float64)
    hi = np.ascontiguousarray(hi, np.float64)
    out = np.empty((max_n, 3), np.float64)
    n = lib.demn_pd_sample(lo, hi, float(r), seed, k_tries, out, max_n)
    return out[:n].copy()


def load_obj(path: str, with_normals: bool = False):
    """Native OBJ load -> (verts f64 (V,3), tris i32 (T,3)) or, with
    `with_normals`, (verts, tris, facet_normals (T,3) or None). Returns
    None when the native library is unavailable or the parse fails."""
    lib = _load()
    if lib is None:
        return None
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    if lib.demn_obj_shape(path.encode(), ctypes.byref(nv), ctypes.byref(nt)):
        return None
    verts = np.empty((nv.value, 3), np.float64)
    tris = np.empty((nt.value, 3), np.int32)
    if lib.demn_obj_read(path.encode(), verts, tris, nv.value, nt.value):
        return None
    if not with_normals:
        return verts, tris
    nrm = np.empty((nt.value, 3), np.float64)
    rc = lib.demn_obj_read_normals(path.encode(), nrm, nt.value)
    if rc == 1:
        return None
    return verts, tris, (nrm if rc == 0 else None)
