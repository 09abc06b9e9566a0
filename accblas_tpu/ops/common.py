"""Shared kernel-layer helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def interpret_default() -> bool:
    """Run Pallas kernels in interpreter mode when no TPU is present (CPU test
    mesh); compiled Mosaic on TPU."""
    return jax.default_backend() != "tpu"


def pow2_ceil(x: int) -> int:
    p = 1
    while p < x:
        p <<= 1
    return p


def min_sublanes(dtype) -> int:
    """Native sublane tile for a storage dtype: f32 (8,128), 16-bit (16,128),
    8-bit (32,128)."""
    return {4: 8, 2: 16, 1: 32}.get(jnp.dtype(dtype).itemsize, 8)


def as_rows128(v: jnp.ndarray, min_rows: int | None = None) -> jnp.ndarray:
    """View a vector as (rows, 128) lanes, at least 8 rows (Mosaic requires
    block sublane dims of 8+ unless equal to the array dim).

    Zero-copy when n % 128 == 0 and n >= 1024 (row-major reshape); otherwise
    pads the tail — a copy, so benchmark sweeps use lane-aligned sizes (the
    reference's sweep values are arbitrary because CUDA kernels do
    per-element bounds checks; on TPU the lane dimension is physical).
    """
    n = v.shape[0]
    if min_rows is None:
        min_rows = min_sublanes(v.dtype)
    min_n = min_rows * 128
    target = max(((n + 127) // 128) * 128, min_n)
    if target != n:
        v = jnp.concatenate([v, jnp.zeros(target - n, v.dtype)])
    return v.reshape(-1, 128)


def compiler_params(**kw):
    """pltpu.CompilerParams with graceful fallback across jax versions."""
    from jax.experimental.pallas import tpu as pltpu

    try:
        return pltpu.CompilerParams(**kw)
    except TypeError:
        kw.pop("dimension_semantics", None)
        return pltpu.CompilerParams(**kw)


def tri_mask(d, lower: bool, unit: bool, *, n=None, offs=None):
    """Select the lower/upper triangle of (..., s, s) blocks: zero the dead
    triangle and optionally force a unit diagonal — the one masking idiom
    shared by the TRSV leaf inversion and the tri-GEMV diagonal step
    (reference kernels guard the same triangle per-element,
    ``cuda/trsv_kernels.cuh:184-199``).

    With ``n``/``offs`` (per-block global row offsets against a logical
    size), past-``n`` lanes continue as identity so padded boundary blocks
    solve to x = 0. Works on plain 2-D blocks inside Pallas kernels and on
    (g, s, s) stacks under jit alike.
    """
    s = d.shape[-1]
    r = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    lead = (1,) * (d.ndim - 2)
    tri = ((r >= c) if lower else (r <= c)).reshape(lead + (s, s))
    diag = (r == c).reshape(lead + (s, s))
    keep = jnp.broadcast_to(tri, d.shape)
    if offs is not None:
        base = offs.reshape(offs.shape + (1, 1))
        keep = keep & ((base + r) < n) & ((base + c) < n)
    d = jnp.where(keep, d, 0.0)
    if unit:
        d = jnp.where(diag, 1.0, d)
    elif offs is not None:
        d = jnp.where(diag & ((base + r) >= n), 1.0, d)
    return d
