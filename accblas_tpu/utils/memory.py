"""Host/device data managers — the reference's L3 memory layer, TPU-mapped.

Reference components being reproduced (SURVEY.md §2):
- ``Memory<T>`` (``cuda/memory.cuh:14-139``): device-tagged owning buffer with
  4-direction ``copy_from``. TPU-native split: the host mirror is a numpy
  float64 *master* array, the device side a jnp array in the storage dtype;
  H→D is ``jax.device_put``, D→H is ``np.asarray``.
- ``DotMemory<T>`` (``cuda/dot_memory.cuh``): x/y vectors + 1-element result,
  conversion constructor between precisions, ``get_result`` D→H.
- ``GemvMemory<T>`` (``cuda/gemv_memory.cuh``): matrix (max-size allocation,
  per-size submatrix views via stride — here: leading-slice views), x, res.
- ``TrsvMemory<T>`` (``cuda/trsv_memory.cuh``): matrix LU-factorized in fp64
  so its triangles are realistic factors (cuSOLVER getrf role →
  scipy.linalg.lu_factor), rhs + pristine ``x_init`` copy for resets.

These are *benchmark-data managers*: the master copy is always fp64 on the
host (the error oracle's input), and ``in_dtype(dt)`` returns the device copy
in any storage dtype — the conversion-constructor semantics
(``cuda/dot_memory.cuh:62-75``) without the per-type class explosion.
"""

from __future__ import annotations

import numpy as np

from .matrix import MatrixInfo, gen_mtx


def to_device(host: np.ndarray, dtype):
    """H→D in a storage dtype (Memory<T>::copy_from, cpu→gpu direction).

    The cast happens HOST-side (ml_dtypes numpy support covers bf16/f16/f8),
    so the tunnel carries the narrow payload — transferring f32 bytes and
    casting on device would double the transfer for bf16 and add an eager
    device dispatch."""
    import jax

    from ..accessor import dtypes as _dt

    try:
        np_dt = _dt.jnp_dtype(_dt.canon(dtype))
    except ValueError:
        np_dt = dtype
    return jax.device_put(np.asarray(host).astype(np_dt))


def to_host(dev) -> np.ndarray:
    """D→H as float64 (the error-measurement direction)."""
    import jax.numpy as jnp

    arr = dev
    if arr.dtype == jnp.bfloat16:
        arr = arr.astype(jnp.float32)
    return np.asarray(arr, np.float64)


class _Base:
    def __init__(self):
        self._device_cache = {}

    @staticmethod
    def _dtype_key(dtype) -> str:
        # canonical spelling: 'bf16' / jnp.bfloat16 / np.dtype('bfloat16')
        # must share one cache slot — a str(dtype) key duplicated multi-GB
        # device buffers for equivalent spellings
        from ..accessor import dtypes as _dt

        try:
            return _dt.canon(dtype)
        except ValueError:
            return str(dtype)

    def _dev(self, name: str, dtype):
        key = (name, self._dtype_key(dtype))
        if key not in self._device_cache:
            self._device_cache[key] = to_device(getattr(self, name), dtype)
        return self._device_cache[key]

    def invalidate(self, name: str | None = None):
        """Drop cached device copies — all of them, or just one buffer's
        (reset_x must not force a re-upload of the unchanged LU matrix
        through the ~0.034 GiB/s tunnel)."""
        if name is None:
            self._device_cache.clear()
        else:
            for k in [k for k in self._device_cache if k[0] == name]:
                del self._device_cache[k]


class DotData(_Base):
    """x/y vectors (reference ``DotMemory``, ``cuda/dot_memory.cuh:18-162``)."""

    def __init__(self, n: int, seed: int = 42):
        super().__init__()
        self.n = n
        self.x = gen_mtx(MatrixInfo(1, n), seed=seed)[0]
        self.y = gen_mtx(MatrixInfo(1, n), seed=seed + 1)[0]

    def x_in(self, dtype):
        return self._dev("x", dtype)

    def y_in(self, dtype):
        return self._dev("y", dtype)

    def randomize(self, seed: int):
        """Fresh randoms for error re-runs (``write_random`` + ``convert_from``,
        ``cuda/dot_benchmark.cu:195-200``)."""
        self.x = gen_mtx(MatrixInfo(1, self.n), seed=seed)[0]
        self.y = gen_mtx(MatrixInfo(1, self.n), seed=seed + 1)[0]
        self.invalidate()

    def reference(self) -> float:
        """fp64 oracle on the master data."""
        return float(self.x @ self.y)


class GemvData(_Base):
    """max-size matrix + vectors; per-size leading views (reference
    ``GemvMemory``, ``cuda/gemv_memory.cuh:18-165``; view trick
    ``cuda/gemv_benchmark.cu:215``)."""

    def __init__(self, max_size: int, seed: int = 42):
        super().__init__()
        self.max_size = max_size
        self.a = gen_mtx(MatrixInfo(max_size, max_size), seed=seed)
        self.x = gen_mtx(MatrixInfo(1, max_size), seed=seed + 1)[0]
        self.res = gen_mtx(MatrixInfo(1, max_size), seed=seed + 2)[0]

    def view(self, n: int, dtype):
        """(A[:n,:n], x[:n], res[:n]) device slices in a storage dtype; the
        full-size device copy is cached and each call dispatches three
        eager device-side slices (a fresh submatrix copy in HBM — callers
        hold the result for the duration of a size's runs rather than
        re-calling per rep)."""
        a = self._dev("a", dtype)[:n, :n]
        x = self._dev("x", dtype)[:n]
        r = self._dev("res", dtype)[:n]
        return a, x, r

    def reference(self, n: int, alpha=1.0, beta=1.0) -> np.ndarray:
        return alpha * (self.a[:n, :n] @ self.x[:n]) + beta * self.res[:n]


class TrsvData(_Base):
    """LU-factorized matrix + rhs with pristine reset copy (reference
    ``TrsvMemory``, ``cuda/trsv_memory.cuh:87-285``; getrf at
    ``cuda/trsv_memory.cuh:150-163``)."""

    def __init__(self, max_size: int, seed: int = 42, diag_boost: float = 0.0):
        super().__init__()
        import scipy.linalg

        self.max_size = max_size
        a = gen_mtx(MatrixInfo(max_size, max_size), seed=seed)
        if diag_boost:
            a += np.eye(max_size) * diag_boost
        self.a, _ = scipy.linalg.lu_factor(a)  # packed LU, pivots unused (as in ref)
        self.b = gen_mtx(MatrixInfo(1, max_size), seed=seed + 1)[0]
        self.x_init = self.b.copy()  # pristine copy (trsv_memory.cuh:208-212)

    def view(self, n: int, dtype):
        return self._dev("a", dtype)[:n, :n], self._dev("b", dtype)[:n]

    def reset_x(self):
        self.b = self.x_init.copy()
        self.invalidate("b")  # 'a' is unchanged — keep its device copy

    def reference(self, n: int, uplo="upper", unit=True) -> np.ndarray:
        import scipy.linalg

        t = np.triu(self.a[:n, :n]) if uplo == "upper" else np.tril(self.a[:n, :n])
        if unit:
            np.fill_diagonal(t, 1.0)
        return scipy.linalg.solve_triangular(t, self.b[:n], lower=(uplo == "lower"))
