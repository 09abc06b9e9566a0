"""Arithmetic/storage dtype system for the accessor.

The reference recovers the arithmetic type of an accessor expression with
``decltype(alpha * mtx(0,0) * x(0,0) + beta * res(0,0))`` and checks it with a
``static_assert`` (reference: ``cuda/gemv_kernels.cuh:86-87``,
``cuda/dot_kernels.cuh:138``, ``cuda/trsv_kernels.cuh:541,739``). Here the same
role is played by an explicit promotion lattice over named arithmetic types:

    f8e5m2 < f8e4m3 < bf16 < f16 < f32 < df64 < f64

- ``f32``/``bf16``/``f16``: native jnp dtypes.
- ``f8e4m3``/``f8e5m2``: 8-bit float *storage-only* tiers (extend the lattice
  below bf16; see utils.matrix.convert_mtx stochastic rounding) — may appear
  as `st`, never as `ar` (use `check_arithmetic`).
- ``df64``: double-float (two-float32) emulated fp64 — the TPU-fast stand-in for
  the reference's fp64 arithmetic tier (see accblas_tpu.ops.df64).
- ``f64``: true float64; only usable where XLA x64 is enabled (CPU tests,
  interpret mode) — kept for oracle parity tests, not for TPU hot paths.

Storage types are plain jnp dtypes (f8e4m3 / f8e5m2 / bf16 / f16 / f32 / f64).
"""

from __future__ import annotations

import jax.numpy as jnp

# canonical type names, in promotion order. The f8 formats extend the
# lattice below bf16 as *storage-only* tiers (8-bit floats exist on TPU as
# storage/convert formats; arithmetic happens after cast-on-load — use
# STORAGE_ONLY to validate an `ar` request).
_ORDER = ("f8e5m2", "f8e4m3", "bf16", "f16", "f32", "df64", "f64")

# types that may appear as `st` but not as `ar`
STORAGE_ONLY = frozenset({"f8e4m3", "f8e5m2"})

_JNP = {
    "f8e4m3": jnp.float8_e4m3fn,
    "f8e5m2": jnp.float8_e5m2,
    "bf16": jnp.bfloat16,
    "f16": jnp.float16,
    "f32": jnp.float32,
    "f64": jnp.float64,
}

_FROM_JNP = {
    jnp.dtype(jnp.float8_e4m3fn): "f8e4m3",
    jnp.dtype(jnp.float8_e5m2): "f8e5m2",
    jnp.dtype(jnp.bfloat16): "bf16",
    jnp.dtype(jnp.float16): "f16",
    jnp.dtype(jnp.float32): "f32",
    jnp.dtype(jnp.float64): "f64",
}


def canon(t) -> str:
    """Canonicalise an arithmetic-type spec (name, jnp dtype, or 'df64')."""
    if isinstance(t, str):
        name = t.lower()
        aliases = {
            "float32": "f32",
            "float64": "f64",
            "bfloat16": "bf16",
            "float16": "f16",
            "fp32": "f32",
            "fp64": "f64",
            "df": "df64",
            "float8_e4m3fn": "f8e4m3",
            "float8_e4m3": "f8e4m3",
            "float8_e5m2": "f8e5m2",
            "f8": "f8e4m3",
            "fp8": "f8e4m3",
        }
        name = aliases.get(name, name)
        if name not in _ORDER:
            raise ValueError(f"unknown arithmetic type {t!r}")
        return name
    dt = jnp.dtype(t)
    if dt not in _FROM_JNP:
        raise ValueError(f"unsupported dtype {t!r}")
    return _FROM_JNP[dt]


# value-embedding partial order: t -> every type that can represent all of
# t's finite values exactly. The narrow tiers are NOT totally ordered:
# bf16 (8 exp, 7 mant) vs f16 (5 exp, 10 mant) embed in neither direction
# (bf16 holds 2^100, f16 doesn't; f16 holds 1+2^-10, bf16 doesn't), and the
# same holds for f8e5m2 (range) vs f8e4m3 (precision). df64 ⊂ f64 exactly
# (hi/lo f32 pair spans ≤ ~49 significand bits < 53).
_SUPER = {
    "f8e5m2": frozenset({"f8e5m2", "bf16", "f16", "f32", "df64", "f64"}),
    "f8e4m3": frozenset({"f8e4m3", "bf16", "f16", "f32", "df64", "f64"}),
    "bf16": frozenset({"bf16", "f32", "df64", "f64"}),
    "f16": frozenset({"f16", "f32", "df64", "f64"}),
    "f32": frozenset({"f32", "df64", "f64"}),
    "df64": frozenset({"df64", "f64"}),
    "f64": frozenset({"f64"}),
}


def promote(*types) -> str:
    """The decltype analogue: the narrowest type that embeds every operand's
    values exactly (a join over the embedding partial order — NOT a max over
    a total order, which would return f16 for (bf16, f16) and overflow
    bf16's exponent range). Ties between incomparable minimal supertypes
    (f8e5m2 + f8e4m3 embeds in both bf16 and f16) resolve to the earlier
    name in _ORDER — bf16, the TPU-idiomatic choice."""
    names = [canon(t) for t in types]
    common = frozenset.intersection(*(_SUPER[n] for n in names))
    return min(common, key=_ORDER.index)


def jnp_dtype(name: str):
    """jnp dtype for a native arithmetic/storage type name (not df64)."""
    name = canon(name)
    if name == "df64":
        raise ValueError("df64 is not a storage dtype; it is an arithmetic pair of f32s")
    return _JNP[name]


def is_df(name) -> bool:
    return canon(name) == "df64"


def check_arithmetic(name) -> str:
    """Canonicalise an *arithmetic*-type spec, rejecting storage-only types
    (the static_assert analogue, reference ``cuda/gemv_kernels.cuh:87``)."""
    name = canon(name)
    if name in STORAGE_ONLY:
        raise ValueError(
            f"{name} is a storage-only tier; pass it as the array dtype and "
            "choose ar='bf16'/'f32'/'df64' (e.g. acc_dot(x8, y8, ar='f32'))"
        )
    return name


def storage_bytes(st) -> int:
    return jnp.dtype(jnp_dtype(st)).itemsize
