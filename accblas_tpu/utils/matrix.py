"""Data-management layer: matrix descriptors, generators, converters.

TPU-native equivalents of the reference's L2/L3 host utilities:
- ``matrix_info`` (reference ``cuda/utils.cuh:18-56``) → `MatrixInfo`.
- ``gen_mtx`` / ``write_random`` (``cuda/matrix_helper.cuh:28-75``): seeded
  uniform(-1,1) generation with the *subnormal filter* (values are resampled
  until ``std::isnormal`` — here: until not subnormal/zero/inf/nan in the
  target precision).
- ``convert_mtx`` (``cuda/matrix_helper.cuh:93-103``): elementwise precision
  conversion, the bridge between the fp64 master copy and lower-precision
  storage copies.
- ``print_mtx`` (``cuda/matrix_helper.cuh:115-133``) → `format_mtx`.

Generation happens host-side in numpy float64 (the master precision), with an
optional C++ fast path (accblas_tpu.native) for large buffers. Device transfer
is ``jax.device_put`` — the analogue of ``Memory<T>::copy_from`` H→D
(``cuda/memory.cuh:99-121``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

_FLT_MIN = np.finfo(np.float32).tiny  # subnormal threshold in target fp32


@dataclass(frozen=True)
class MatrixInfo:
    """POD descriptor of a row-major 2-D matrix: extents + row stride.

    `stride >= cols` permits submatrix views of a larger allocation — the
    pattern the reference's GEMV sweep uses (one max_size² buffer, per-size
    views; ``cuda/gemv_benchmark.cu:215``).
    """

    rows: int
    cols: int
    stride: int | None = None

    def __post_init__(self):
        if self.stride is None:
            object.__setattr__(self, "stride", self.cols)
        if self.stride < self.cols:
            raise ValueError("stride must be >= cols")

    @property
    def size(self):
        return (self.rows, self.cols)

    def get_1d_size(self) -> int:
        return self.rows * self.stride

    def get_num_elems(self) -> int:
        return self.rows * self.cols


def gen_mtx(info: MatrixInfo, seed: int = 42, lo: float = -1.0, hi: float = 1.0) -> np.ndarray:
    """Random row-major matrix in float64, honoring stride, subnormal-filtered.

    Mirrors ``gen_mtx`` (``cuda/matrix_helper.cuh:38-47``): entries outside the
    view (stride padding) are left zero; every sampled value is resampled until
    it is a normal number *in float32* (so the later fp32/bf16 storage copies
    contain no subnormals either — same intent as the reference, which filters
    in the storage type's range). Uses the counter-based stream from
    utils.prng — bit-identical between the numpy path and the native C++
    fast path.
    """
    try:
        from ..native import host as _native
    except Exception:  # pragma: no cover - native lib optional
        _native = None
    if _native is not None and _native.available():
        return _native.gen_mtx(info.rows, info.cols, info.stride, seed, lo, hi)

    from . import prng

    vals = prng.uniform_filtered(info.get_num_elems(), seed, lo, hi)
    out = np.zeros((info.rows, info.stride), np.float64)
    out[:, : info.cols] = vals.reshape(info.rows, info.cols)
    return out


def write_random(buf: np.ndarray, info: MatrixInfo, seed: int, lo=-1.0, hi=1.0) -> None:
    """Overwrite an existing buffer view with fresh randoms (reference
    ``cuda/matrix_helper.cuh:65-75``; used by the DOT error re-randomization,
    ``cuda/dot_benchmark.cu:195-198``)."""
    buf[: info.rows, : info.cols] = gen_mtx(
        MatrixInfo(info.rows, info.cols), seed=seed, lo=lo, hi=hi
    )[:, : info.cols]


def convert_mtx(src: np.ndarray, dtype, rounding: str = "nearest", seed: int = 0) -> np.ndarray:
    """Elementwise precision conversion (reference ``cuda/matrix_helper.cuh:93-103``).

    `dtype` accepts numpy dtypes or lattice names ('bf16', 'f16', 'f8e4m3',
    'f8e5m2', ...). ``rounding='stochastic'`` uses the zero-mean SR converter
    (utils.sr) — the recommended mode for the f8 storage tiers."""
    from ..accessor import dtypes as _dt

    try:
        name = _dt.canon(dtype)
    except ValueError:
        return src.astype(dtype)
    if rounding == "stochastic":
        if name in ("f64", "f32"):
            raise ValueError(
                "stochastic rounding targets the narrow storage tiers "
                "(bf16/f16/f8); use rounding='nearest' for f32/f64"
            )
        from . import sr

        return sr.sr_round(src, name, seed=seed)
    # host-side cast for every tier: ml_dtypes registers bf16/f8 as numpy
    # dtypes, so no device round-trip (a jnp cast would ship the array
    # through the TPU tunnel eagerly — minutes for GiB-scale masters)
    return src.astype(_dt.jnp_dtype(name))


def format_mtx(mtx: np.ndarray, max_rows: int = 8, max_cols: int = 8) -> str:
    """Debug formatter (reference ``print_mtx``, ``cuda/matrix_helper.cuh:115-133``)."""
    view = mtx[:max_rows, :max_cols] if mtx.ndim == 2 else mtx[:max_rows]
    return np.array2string(np.asarray(view, np.float64), precision=6, suppress_small=False)
