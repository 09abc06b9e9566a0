"""Range / ReducedRowMajor: the accessor abstraction, rebuilt TPU-native.

Reference semantics being reproduced (see SURVEY.md §2 C3):

- ``gko::acc::reduced_row_major<2, ArType, StType>`` decouples the *storage*
  precision of a buffer from the *arithmetic* precision of the kernel
  (reference usage: ``cuda/gemv_kernels.cuh:183-189``,
  ``cuda/dot_kernels.cuh:233-243``, ``cuda/trsv_kernels.cuh:923-933``).
- Reads (``range(i, j)``) load StType and cast to ArType; writes cast
  ArType → StType on store (``cuda/gemv_kernels.cuh:108-110``).
- ``range.length(d)`` queries extents (``cuda/gemv_kernels.cuh:90,94``).
- Const accessors guard read-only operands (``cuda/gemv_kernels.cuh:186-188``).
- Ranges are passed *by value* into device kernels — POD views. Here a Range is
  a lightweight wrapper that works over three carrier kinds:

    1. numpy / jnp arrays (host + traced JAX code),
    2. Pallas ``Ref`` blocks inside kernels (the CUDA-device analogue),
    3. nothing-special pytrees — Range is itself registered as a pytree, so it
       can cross ``jit`` / ``pallas_call`` boundaries.

TPU-first note on strides: the CUDA version bakes a runtime row ``stride``
into the accessor because kernels address raw pointers
(``cuda/dot_kernels.cuh:139-141``, reference README.md:22). Here ``stride`` is
a first-class Range argument: a Range with ``size=(m, n), stride=S`` views an
m-by-n window of a parent carrier whose physical row length is S — the
"submatrix of a larger allocation" pattern (``cuda/gemv_benchmark.cu:215``).
Reads/writes map logical (i, j) to parent (i, j) [2-D carrier] or flat
``i*S + j`` [1-D carrier]; ``load()`` returns the windowed block, which XLA
folds into the access (no copy under jit). Inside Pallas the same composition
is expressed by passing the *parent* array to ``pallas_call`` with a BlockSpec
index map offsetting into it — the kernel body sees a Range over the windowed
Ref and is written once for both cases (tests/test_accessor.py covers both).

The arithmetic-type recovery (``decltype`` in C++) is `dtypes.promote`;
df64 arithmetic values are `ops.df64.DF` pairs.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from . import dtypes
from ..ops.df64 import DF, df_to_f32


@dataclass(frozen=True)
class ReducedRowMajor:
    """Accessor spec: (arithmetic type, storage type), 2-D row-major semantics.

    Mirrors ``gko::acc::reduced_row_major<2, ArType, StType>`` — dimensionality
    is fixed at 2 like every use in the reference ("even for vectors, so we can
    access vectors with a stride", reference README.md:22).
    """

    ar: str  # arithmetic type name ('f32', 'df64', 'f64', 'bf16')
    st: str  # storage type name   ('f32', 'bf16', 'f16', 'f64')

    def __post_init__(self):
        # check_arithmetic: storage-only tiers (f8) must not appear as ar —
        # the static_assert analogue, enforced at the public accessor layer
        # and not just in the op entry points
        object.__setattr__(self, "ar", dtypes.check_arithmetic(self.ar))
        object.__setattr__(self, "st", dtypes.canon(self.st))
        if self.st == "df64":
            raise ValueError("storage type must be a real dtype, not df64")

    @property
    def st_dtype(self):
        return dtypes.jnp_dtype(self.st)

    # cast-on-load: StType value -> ArType value
    def load_cast(self, raw):
        if self.ar == "df64":
            if raw.dtype == jnp.float64:
                # exact two-word split of f64 storage: hi + lo == x to within
                # df64's ~49-bit significand (truncating to a single f32 would
                # silently drop ~29 bits). |x| beyond f32 range saturates hi
                # to inf; lo must be zeroed there or DF(inf, -inf) evaluates
                # to NaN instead of the saturated inf.
                hi = raw.astype(jnp.float32)
                lo = jnp.where(
                    jnp.isfinite(hi),
                    (raw - hi.astype(jnp.float64)).astype(jnp.float32),
                    jnp.float32(0.0),
                )
                return DF(hi, lo)
            x = raw.astype(jnp.float32) if raw.dtype != jnp.float32 else raw
            return DF(x, jnp.zeros_like(x))
        return raw.astype(dtypes.jnp_dtype(self.ar))

    # cast-on-store: ArType value -> StType value
    def store_cast(self, value):
        st = dtypes.jnp_dtype(self.st)
        if isinstance(value, DF):
            if self.st == "f64":
                # f64 storage can hold the full df64 width — summing the
                # words in f64 is exact (≤ ~49 significand bits); rounding
                # through f32 first would silently drop the lo word
                return value.hi.astype(jnp.float64) + value.lo.astype(jnp.float64)
            return df_to_f32(value).astype(st)
        return jnp.asarray(value).astype(st)


class Range:
    """User-facing accessor view over an array or Pallas Ref.

    ``r[i, j]`` / ``r.load()`` read storage and cast to the arithmetic type;
    ``r.set(idx, value)`` / ``r.store(value)`` cast back to storage on write.
    ``length(d)`` gives logical extents. ``const=True`` makes writes raise —
    the analogue of ``Accessor::const_accessor``.

    ``stride`` (optional) is the physical row length of the parent carrier
    when the Range is an (m, n) sub-window of a larger allocation (the
    reference's stride-in-accessor, ``cuda/dot_kernels.cuh:139-141``): the
    carrier must be 2-D with row length == stride, or 1-D flat with
    ``len >= m * stride``. Omitted/None means the view is dense (stride ==
    n for 2-D carriers).
    """

    __slots__ = ("spec", "data", "_size", "const", "stride")

    def __init__(self, spec: ReducedRowMajor, data, size=None, const=False, stride=None):
        self.spec = spec
        self.data = data
        self.const = const
        if size is None:
            shape = getattr(data, "shape", None)
            size = tuple(shape) if shape is not None else None
        self._size = tuple(size) if size is not None else None
        self.stride = None if stride is None else int(stride)
        if self.stride is None and self._size is not None:
            # a dense view must match the carrier: a narrower explicit size
            # would make length() disagree with what load() returns (a
            # sub-window of a wider carrier is exactly what stride= is for)
            shape = getattr(data, "shape", None)
            if shape is not None and tuple(shape) != self._size:
                raise ValueError(
                    f"size {self._size} != carrier shape {tuple(shape)}; "
                    "pass stride= to view a sub-window of a larger carrier"
                )
        if self.stride is not None:
            if self._size is None or len(self._size) != 2:
                raise ValueError("stride requires an explicit 2-D size=(m, n)")
            m, n = self._size
            if self.stride < n:
                raise ValueError(f"stride {self.stride} < row length {n}")
            shape = tuple(getattr(data, "shape", ()))
            if len(shape) == 2:
                if shape[1] != self.stride or shape[0] < m:
                    raise ValueError(
                        f"2-D carrier {shape} incompatible with size {self._size} "
                        f"stride {self.stride}"
                    )
            elif len(shape) == 1:
                if shape[0] < m * self.stride:
                    raise ValueError(
                        f"flat carrier of {shape[0]} elems < m*stride = {m * self.stride}"
                    )
            else:
                raise ValueError("strided Range needs a 1-D or 2-D carrier")

    # map a logical index to the parent carrier's index space
    def _map_idx(self, idx):
        if self.stride is None:
            return idx
        if not (isinstance(idx, tuple) and len(idx) == 2):
            raise IndexError("strided Range indexing needs an (i, j) pair")
        i, j = idx
        if len(getattr(self.data, "shape", ())) == 1:
            return i * self.stride + j
        return (i, j)

    def _window(self):
        """The logically-sized (m, n) block of the parent carrier."""
        if self.stride is None:
            return self.data[...]
        m, n = self._size
        if len(getattr(self.data, "shape", ())) == 1:
            return self.data[: m * self.stride].reshape(m, self.stride)[:, :n]
        return self.data[:m, :n]

    # --- queries -------------------------------------------------------
    def length(self, dim: int) -> int:
        return self._size[dim]

    @property
    def shape(self):
        return self._size

    @property
    def ar(self):
        return self.spec.ar

    @property
    def st(self):
        return self.spec.st

    # --- reads ---------------------------------------------------------
    def __getitem__(self, idx):
        return self.spec.load_cast(self.data[self._map_idx(idx)])

    def load(self, idx=None):
        """Read the whole view (or a sub-index) as the arithmetic type."""
        raw = self._window() if idx is None else self.data[self._map_idx(idx)]
        return self.spec.load_cast(raw)

    def load_raw(self, idx=None):
        """Read storage-typed values without the cast.

        Used by MXU consumers: feeding bf16 straight into ``jnp.dot(...,
        preferred_element_type=f32)`` performs the cast-on-load *inside* the
        systolic array — same semantics as load(), zero extra bandwidth/ops.
        """
        return self._window() if idx is None else self.data[self._map_idx(idx)]

    # --- writes --------------------------------------------------------
    def set(self, idx, value):
        if self.const:
            raise TypeError("write to const Range")
        try:
            self.data[self._map_idx(idx)] = self.spec.store_cast(value)
        except TypeError as e:
            raise TypeError(
                "in-place Range writes need a mutable carrier (numpy array or "
                "Pallas ref); use Range.updated(...) for jnp arrays"
            ) from e

    def store(self, value, idx=None):
        if self.const:
            raise TypeError("write to const Range")
        cast = self.spec.store_cast(value)
        try:
            if idx is not None:
                self.data[self._map_idx(idx)] = cast
            elif self.stride is None:
                self.data[...] = cast
            else:
                # whole-view store targets the SAME (m, n) window load()
                # reads — never the full parent carrier (writing data[...]
                # would corrupt the out-of-window columns of every row)
                m, n = self._size
                if len(getattr(self.data, "shape", ())) == 1:
                    # numpy: the contiguous slice reshapes to a view, so the
                    # column-sliced assignment mutates the parent in place
                    self.data[: m * self.stride].reshape(m, self.stride)[
                        :, :n
                    ] = cast
                else:
                    self.data[:m, :n] = cast
        except TypeError as e:
            raise TypeError(
                "in-place Range writes need a mutable carrier (numpy array or "
                "Pallas ref); use Range.updated(...) for jnp arrays"
            ) from e

    def updated(self, idx, value) -> "Range":
        """Functional write for immutable jnp-array carriers: returns a new
        Range with ``data.at[idx].set(cast(value))``. Pallas refs and numpy
        arrays use the mutating ``set``/``store`` instead."""
        if self.const:
            raise TypeError("write to const Range")
        new = self.data.at[self._map_idx(idx)].set(self.spec.store_cast(value))
        return Range(self.spec, new, self._size, self.const, self.stride)

    # --- misc ----------------------------------------------------------
    def as_const(self) -> "Range":
        return Range(self.spec, self.data, self._size, const=True, stride=self.stride)

    def __repr__(self):
        return (
            f"Range<ar={self.spec.ar}, st={self.spec.st}, size={self._size}, "
            f"const={self.const}, stride={self.stride}>"
        )


def _range_flatten(r: Range):
    return (r.data,), (r.spec, r._size, r.const, r.stride)


def _range_unflatten(aux, children):
    # bypass __init__: JAX transforms unflatten with transformed leaves
    # (vmap-batched shapes) or opaque placeholders (object() dummies in
    # flatten_axes) that must not be re-validated — the documented
    # custom-pytree rule
    spec, size, const, stride = aux
    r = object.__new__(Range)
    r.spec = spec
    r.data = children[0]
    r._size = size
    r.const = const
    r.stride = stride
    return r


jax.tree_util.register_pytree_node(Range, _range_flatten, _range_unflatten)


def make_range(ar, st, data, size=None, const=False, stride=None) -> Range:
    """Convenience constructor mirroring the reference's range-building blocks
    (``cuda/gemv_kernels.cuh:177-189``)."""
    return Range(ReducedRowMajor(ar, st), data, size=size, const=const, stride=stride)
