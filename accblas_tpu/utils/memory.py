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
    """H→D in a storage dtype (Memory<T>::copy_from, cpu→gpu direction)."""
    import jax
    import jax.numpy as jnp

    if str(dtype) in ("bf16", "bfloat16"):
        return jax.device_put(host.astype(np.float32)).astype(jnp.bfloat16)
    return jax.device_put(np.asarray(host).astype(dtype))


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

    def _dev(self, name: str, dtype):
        key = (name, str(dtype))
        if key not in self._device_cache:
            self._device_cache[key] = to_device(getattr(self, name), dtype)
        return self._device_cache[key]

    def invalidate(self):
        self._device_cache.clear()


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
        """(A[:n,:n], x[:n], res[:n]) device views in a storage dtype; the
        full-size device copy is cached, slicing is XLA-lazy."""
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
        self.invalidate()

    def reference(self, n: int, uplo="upper", unit=True) -> np.ndarray:
        import scipy.linalg

        t = np.triu(self.a[:n, :n]) if uplo == "upper" else np.tril(self.a[:n, :n])
        if unit:
            np.fill_diagonal(t, 1.0)
        return scipy.linalg.solve_triangular(t, self.b[:n], lower=(uplo == "lower"))
