"""ctypes binding for the native host runtime (libaccblas_host.so).

Builds lazily with the Makefile on first use (g++ + OpenMP); every entry point
has a numpy fallback in accblas_tpu.utils, and the two paths are bit-identical
for generation (tests/test_native.py). Set ACCBLAS_NO_NATIVE=1 to force the
numpy paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_SO = _DIR / "libaccblas_host.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("ACCBLAS_NO_NATIVE"):
        return None
    if not _SO.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None

    lib.ab_gen_mtx.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_uint64,
        ctypes.c_double,
        ctypes.c_double,
    ]
    lib.ab_abs_diff_norm1.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
    ]
    lib.ab_abs_diff_norm1.restype = ctypes.c_double
    lib.ab_norm1.argtypes = [ctypes.POINTER(ctypes.c_double), ctypes.c_int64]
    lib.ab_norm1.restype = ctypes.c_double
    lib.ab_convert_f64_f32.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.ab_convert_f64_bf16.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_uint16),
        ctypes.c_int64,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def gen_mtx(rows: int, cols: int, stride: int, seed: int, lo: float, hi: float) -> np.ndarray:
    lib = _load()
    out = np.empty((rows, stride), np.float64)
    lib.ab_gen_mtx(_dptr(out), rows, cols, stride, seed, lo, hi)
    return out


def abs_diff_norm1(a: np.ndarray, b: np.ndarray) -> float:
    lib = _load()
    a = np.ascontiguousarray(a, np.float64).ravel()
    b = np.ascontiguousarray(b, np.float64).ravel()
    assert a.size == b.size
    return lib.ab_abs_diff_norm1(_dptr(a), _dptr(b), a.size)


def norm1(a: np.ndarray) -> float:
    lib = _load()
    a = np.ascontiguousarray(a, np.float64).ravel()
    return lib.ab_norm1(_dptr(a), a.size)


def convert_f64_f32(a: np.ndarray) -> np.ndarray:
    lib = _load()
    a = np.ascontiguousarray(a, np.float64)
    out = np.empty(a.shape, np.float32)
    lib.ab_convert_f64_f32(_dptr(a), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), a.size)
    return out


def convert_f64_bf16(a: np.ndarray) -> np.ndarray:
    """float64 -> bfloat16 (returns an ml_dtypes.bfloat16 numpy array)."""
    import ml_dtypes

    lib = _load()
    a = np.ascontiguousarray(a, np.float64)
    out = np.empty(a.shape, np.uint16)
    lib.ab_convert_f64_bf16(_dptr(a), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), a.size)
    return out.view(ml_dtypes.bfloat16)
