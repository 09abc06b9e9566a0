"""Accessor (Range / ReducedRowMajor) semantics: cast-on-load, cast-on-store,
length queries, const-ness, dtype promotion — mirroring the reference's
accessor contract (SURVEY.md §2 C3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from accblas_tpu import Range, ReducedRowMajor, make_range, promote
from accblas_tpu.ops.df64 import DF, df_to_f64


def test_promotion_lattice():
    # decltype analogue (cuda/dot_kernels.cuh:138, gemv_kernels.cuh:86)
    assert promote("f32", "f32") == "f32"
    assert promote("f32", "bf16") == "f32"
    assert promote("df64", "f32") == "df64"
    assert promote("f64", "df64") == "f64"
    assert promote(jnp.float32, jnp.bfloat16) == "f32"


def test_load_cast_f32_storage_df64_arith(rng):
    data = jnp.asarray(rng.uniform(-1, 1, (4, 4)).astype(np.float32))
    r = make_range("df64", "f32", data, const=True)
    v = r[1, 2]
    assert isinstance(v, DF)
    assert float(v.hi) == float(data[1, 2])
    assert float(v.lo) == 0.0
    assert r.length(0) == 4 and r.length(1) == 4


def test_load_cast_bf16_storage_f32_arith(rng):
    data = jnp.asarray(rng.uniform(-1, 1, (8, 8)).astype(np.float32)).astype(jnp.bfloat16)
    r = make_range("f32", "bf16", data, const=True)
    v = r.load()
    assert v.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(v), np.asarray(data.astype(jnp.float32)))


def test_store_cast_rounds_to_storage(rng):
    data = np.zeros((2, 2), np.float32)
    r = make_range("df64", "f32", data)
    exact = DF(jnp.float32(0.1), jnp.float32(1e-9))
    r.set((0, 1), exact)
    # stored value is the fp32 rounding of hi+lo
    assert data[0, 1] == np.float32(np.float64(np.float32(0.1)) + 1e-9)


def test_const_range_rejects_writes(rng):
    data = np.zeros((2, 2), np.float32)
    r = make_range("f32", "f32", data, const=True)
    with pytest.raises(TypeError):
        r.set((0, 0), 1.0)
    with pytest.raises(TypeError):
        r.as_const().store(1.0)


def test_functional_update_on_jnp(rng):
    data = jnp.zeros((2, 2), jnp.bfloat16)
    r = make_range("f32", "bf16", data)
    r2 = r.updated((1, 1), jnp.float32(0.30078125))  # bf16-representable
    assert float(r2.data[1, 1]) == 0.30078125
    assert r2.data.dtype == jnp.bfloat16


def test_range_crosses_jit_as_pytree(rng):
    data = jnp.asarray(rng.uniform(-1, 1, (16, 16)).astype(np.float32))
    r = make_range("df64", "f32", data, const=True)

    @jax.jit
    def f(rng_in: Range):
        v = rng_in.load()
        return df_to_f64_traced(v)

    def df_to_f64_traced(v):
        return v.hi  # just prove the Range flows through jit

    out = f(r)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(data))


def test_storage_df64_rejected():
    with pytest.raises(ValueError):
        ReducedRowMajor("f32", "df64")
