"""ctypes bindings for the native host kernels (kernels.cc).

Builds the shared library on first use (g++ -O3) and caches it next to the
source; falls back cleanly (``available() == False``) if no toolchain is
present. See kernels.cc for what each kernel replaces in the reference.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "kernels.cc")


def _src_hash() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


# The library name embeds a source hash: checkout mtimes are arbitrary, so an
# mtime staleness check can load a stale (or foreign-host, -march=native)
# binary; a hash-named artifact is only ever loaded if built from this exact
# source on this machine (the .so is gitignored, built on first use).
_LIB = os.path.join(_DIR, f"libamfnative-{_src_hash()}.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

_c_i64 = ctypes.c_int64
_p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_p_f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_p_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
             "-o", _LIB],
            check=True, capture_output=True,
        )
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB):
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB)

        lib.amf_spouterprod.argtypes = [
            _c_i64, _p_i64, _p_i64, _p_f64, _p_f64, ctypes.c_double, _p_f64
        ]
        lib.amf_sprowsumprod.argtypes = [
            _c_i64, _c_i64, _c_i64, _p_i64, _p_i64, _p_f64, _p_f64,
            _p_f64, _p_f64,
        ]
        lib.amf_sprowcolsum.argtypes = [
            _c_i64, _c_i64, _p_i64, _p_i64, _p_f64, _p_f64, _p_f64
        ]
        lib.amf_coo_to_dense.argtypes = [
            _c_i64, _c_i64, _c_i64, _p_f64, _p_f64, _p_u8
        ]
        lib.amf_coo_to_dense.restype = _c_i64
        lib.amf_masked_rmse.argtypes = [_c_i64, _p_f64, _p_f64, _p_u8]
        lib.amf_masked_rmse.restype = ctypes.c_double
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def spouterprod(i_idx, j_idx, u, v, clamp: float = 1e128) -> np.ndarray:
    lib = _load()
    assert lib is not None
    i_idx = np.ascontiguousarray(i_idx, np.int64)
    j_idx = np.ascontiguousarray(j_idx, np.int64)
    u = np.ascontiguousarray(u, np.float64)
    v = np.ascontiguousarray(v, np.float64)
    out = np.empty(i_idx.shape[0], np.float64)
    lib.amf_spouterprod(i_idx.shape[0], i_idx, j_idx, u, v, clamp, out)
    return out


def sprowsumprod(i_idx, j_idx, p, F, n: int, m: int) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    assert lib is not None
    i_idx = np.ascontiguousarray(i_idx, np.int64)
    j_idx = np.ascontiguousarray(j_idx, np.int64)
    p = np.ascontiguousarray(p, np.float64)
    F = np.ascontiguousarray(F, np.float64)
    nnz, S = p.shape
    K = F.shape[1]
    rowsum = np.zeros((n, K), np.float64)
    colsum = np.zeros((m, K), np.float64)
    lib.amf_sprowsumprod(nnz, S, K, i_idx, j_idx, p, F, rowsum, colsum)
    return rowsum, colsum


def sprowcolsum(i_idx, j_idx, E, n: int, m: int) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    assert lib is not None
    i_idx = np.ascontiguousarray(i_idx, np.int64)
    j_idx = np.ascontiguousarray(j_idx, np.int64)
    E = np.ascontiguousarray(E, np.float64)
    nnz, K = E.shape
    rowsum = np.zeros((n, K), np.float64)
    colsum = np.zeros((m, K), np.float64)
    lib.amf_sprowcolsum(nnz, K, i_idx, j_idx, E, rowsum, colsum)
    return rowsum, colsum


def coo_to_dense(ratings, n: int, m: int) -> Tuple[np.ndarray, np.ndarray, int]:
    """(values, mask, n_duplicates) from a (nnz, 3) [i, j, value] array."""
    lib = _load()
    assert lib is not None
    ratings = np.ascontiguousarray(ratings, np.float64)
    values = np.zeros((n, m), np.float64)
    mask = np.zeros((n, m), np.uint8)
    dups = lib.amf_coo_to_dense(ratings.shape[0], n, m, ratings, values, mask)
    return values, mask.astype(bool), int(dups)


def masked_rmse(pred, target, mask) -> float:
    lib = _load()
    assert lib is not None
    pred = np.ascontiguousarray(pred, np.float64).ravel()
    target = np.ascontiguousarray(target, np.float64).ravel()
    mask = np.ascontiguousarray(mask, np.uint8).ravel()
    return float(lib.amf_masked_rmse(pred.shape[0], pred, target, mask))
