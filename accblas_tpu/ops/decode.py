"""Integer-carrier decoders for narrow float formats — retained experiments.

NOT on any hot path. These were built for an int8-carrier Pallas route around
Mosaic's slow native f8/f16 conversions (measured ~9% of HBM roofline,
apparently scalarized), decoding the bit patterns with full-rate integer/
select VPU ops instead. The narrow-storage tiers were ultimately routed
through XLA's own lowering (ops.dot/ops.gemv route f8/f16 storage to the
XLA-composed path, which reaches ~90% of roofline), so nothing in the
library calls these today. They stay because (a) tests/test_decode.py proves
them exhaustively correct over every representable bit pattern, and (b) they
become the fast path again if a future Mosaic fixes 8-bit vreg unpack
economics (CLAUDE.md round-3 candidate #3).

Handles normals, subnormals, signed zero, and each format's NaN/inf
encodings (e4m3fn's 0x7F/0xFF NaN; IEEE-style e5m2/f16).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def decode_f8e4m3(bits):
    """f8e4m3fn bit pattern (int8/uint8 array) -> float32, integer VPU ops
    only."""
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
