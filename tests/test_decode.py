"""Exhaustive bit-pattern tests for the integer-carrier float decoders
(ops.decode.*, retained int8-carrier experiments) — every representable value of each narrow format."""

import numpy as np
import jax
import jax.numpy as jnp

from accblas_tpu.ops.decode import decode_f8e4m3, decode_f8e5m2, decode_f16


def test_decode_f8e4m3_all_256():
    bits = np.arange(256, dtype=np.uint8)
    ref = jax.lax.bitcast_convert_type(
        jnp.asarray(bits), jnp.float8_e4m3fn
    ).astype(jnp.float32)
    got = decode_f8e4m3(jnp.asarray(bits.view(np.int8)))
    r, g = np.asarray(ref, np.float64), np.asarray(got, np.float64)
    nan_r = np.isnan(r)
    assert np.array_equal(nan_r, np.isnan(g))
    assert np.array_equal(r[~nan_r], g[~nan_r])
    # -0.0 sign preserved
    assert np.signbit(g[128]) and g[128] == 0.0


def test_decode_f8e5m2_all_256():
    bits = np.arange(256, dtype=np.uint8)
    ref = jax.lax.bitcast_convert_type(
        jnp.asarray(bits), jnp.float8_e5m2
    ).astype(jnp.float32)
    got = decode_f8e5m2(jnp.asarray(bits.view(np.int8)))
    r, g = np.asarray(ref, np.float64), np.asarray(got, np.float64)
    nan_r = np.isnan(r)
    assert np.array_equal(nan_r, np.isnan(g))
    assert np.array_equal(r[~nan_r], g[~nan_r])


def test_decode_f16_all_65536():
    bits = np.arange(65536, dtype=np.uint16)
    ref = bits.view(np.float16).astype(np.float64)
    got = np.asarray(decode_f16(jnp.asarray(bits.view(np.int16))), np.float64)
    nan_r = np.isnan(ref)
    assert np.array_equal(nan_r, np.isnan(got))
    assert np.array_equal(ref[~nan_r], got[~nan_r])
