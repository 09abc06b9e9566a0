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


def decode_f8e4m3(bits):
    """f8e4m3fn bit pattern (int8/uint8 array) -> float32, integer VPU ops
    only.

    Mosaic's native f8 conversions measured ~9% of HBM roofline in the DOT
    kernel (apparently scalarized); the int8-carrier + manual decode path
    keeps the load on the native int8 tile format and the conversion in
    full-rate integer/select ops. Handles normals, subnormals, signed zero,
    and maps the e4m3fn NaN encoding (0x7F/0xFF) to f32 NaN.
    """
    u = bits.astype(jnp.int32) & 0xFF
    s = (u >> 7) & 1
    e = (u >> 3) & 0xF
    m = u & 7
    # normal: f32 exponent = e - 7 + 127 = e + 120; mantissa top 3 bits
    f32n = (s << 31) | ((e + 120) << 23) | (m << 20)
    vn = jax.lax.bitcast_convert_type(f32n.astype(jnp.int32), jnp.float32)
    # subnormal (e == 0): value = m * 2^-9
    vs = m.astype(jnp.float32) * jnp.float32(2.0**-9)
    vs = jnp.where(s == 1, -vs, vs)
    out = jnp.where(e == 0, vs, vn)
    return jnp.where((e == 15) & (m == 7), jnp.float32(jnp.nan), out)


def decode_f8e5m2(bits):
    """f8e5m2 bit pattern (int8/uint8 array) -> float32 (IEEE-style: has
    inf and NaN at e == 31)."""
    u = bits.astype(jnp.int32) & 0xFF
    s = (u >> 7) & 1
    e = (u >> 2) & 0x1F
    m = u & 3
    f32n = (s << 31) | ((e + 112) << 23) | (m << 21)
    vn = jax.lax.bitcast_convert_type(f32n.astype(jnp.int32), jnp.float32)
    vs = m.astype(jnp.float32) * jnp.float32(2.0**-16)
    vs = jnp.where(s == 1, -vs, vs)
    vinf = jax.lax.bitcast_convert_type(
        ((s << 31) | (255 << 23) | (m << 21)).astype(jnp.int32), jnp.float32
    )
    out = jnp.where(e == 0, vs, jnp.where(e == 31, vinf, vn))
    return out


def decode_f16(bits):
    """f16 bit pattern (int16 array) -> float32, integer VPU ops only
    (Mosaic has no f16 type at all)."""
    u = bits.astype(jnp.int32) & 0xFFFF
    s = (u >> 15) & 1
    e = (u >> 10) & 0x1F
    m = u & 0x3FF
    f32n = (s << 31) | ((e + 112) << 23) | (m << 13)
    vn = jax.lax.bitcast_convert_type(f32n.astype(jnp.int32), jnp.float32)
    vs = m.astype(jnp.float32) * jnp.float32(2.0**-24)
    vs = jnp.where(s == 1, -vs, vs)
    vinf = jax.lax.bitcast_convert_type(
        ((s << 31) | (255 << 23) | (m << 13)).astype(jnp.int32), jnp.float32
    )
    return jnp.where(e == 0, vs, jnp.where(e == 31, vinf, vn))


def compiler_params(**kw):
    """pltpu.CompilerParams with graceful fallback across jax versions."""
    from jax.experimental.pallas import tpu as pltpu

    try:
        return pltpu.CompilerParams(**kw)
    except TypeError:
        kw.pop("dimension_semantics", None)
        return pltpu.CompilerParams(**kw)
