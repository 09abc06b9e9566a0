"""Error-analysis reductions — accurate host-side reference math.

Reproduces the reference's error pipeline:
- tree ``reduce`` (``cuda/utils.cuh:281-300``): in-place binary-tree (halving)
  reduction with an arbitrary op, used "so the error of the error stays small";
- ``compare`` (``cuda/utils.cuh:315-332``): 1-norm of the elementwise absolute
  difference between a result and the fp64 reference.

Host-side in numpy float64 (optionally long double via the native C++ library),
since this is measurement code, not a hot path.
"""

from __future__ import annotations

import numpy as np


def tree_reduce(vals: np.ndarray, op=np.add) -> float:
    """Binary-tree (pairwise/halving) reduction, reference ``cuda/utils.cuh:281-300``."""
    cur = np.asarray(vals, np.float64).ravel().copy()
    n = cur.size
    if n == 0:
        return 0.0
    while n > 1:
        half = n // 2
        rem = n - 2 * half
        cur[:half] = op(cur[:half], cur[half : 2 * half])
        if rem:
            cur[half] = cur[2 * half]
        n = half + rem
    return float(cur[0])


def compare(result: np.ndarray, reference: np.ndarray) -> float:
    """1-norm of |result - reference| via tree reduction (``cuda/utils.cuh:315-332``)."""
    try:
        from ..native import host as _native
    except Exception:  # pragma: no cover
        _native = None
    a = np.asarray(result, np.float64).ravel()
    b = np.asarray(reference, np.float64).ravel()
    if _native is not None and _native.available():
        return _native.abs_diff_norm1(a, b)
    return tree_reduce(np.abs(a - b))


def norm1(x: np.ndarray) -> float:
    """1-norm through the same accumulator the numerator uses: native long
    double when built, f64 pairwise otherwise — relative_error's numerator
    and denominator must not mix precisions."""
    try:
        from ..native import host as _native
    except Exception:  # pragma: no cover
        _native = None
    a = np.abs(np.asarray(x, np.float64)).ravel()
    if _native is not None and _native.available():
        return _native.norm1(a)
    return tree_reduce(a)


def relative_error(result: np.ndarray, reference: np.ndarray) -> float:
    """GEMV/TRSV error metric: ||result - ref||_1 / ||ref||_1
    (``cuda/gemv_benchmark.cu:224-231``, ``cuda/trsv_benchmark.cu:211-216``)."""
    denom = norm1(reference)
    return compare(result, reference) / denom if denom else float("nan")
