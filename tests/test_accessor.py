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


def test_load_cast_f64_storage_df64_exact_split(rng):
    # f64 storage under df64 arithmetic splits exactly into hi/lo words
    # (truncating to one f32 would lose ~29 bits)
    data = rng.uniform(-1, 1, (4, 4)).astype(np.float64)
    r = make_range("df64", "f64", data, const=True)
    v = r.load()
    assert isinstance(v, DF)
    back = np.asarray(v.hi, np.float64) + np.asarray(v.lo, np.float64)
    # hi+lo recovers f64 to within df64's ~2^-48 significand
    np.testing.assert_allclose(back, data, rtol=2**-45, atol=0)
    assert np.max(np.abs(np.asarray(v.lo))) > 0  # lo words carry real bits


def test_strided_range_2d_carrier(rng):
    # (m, n) window of a larger (M, S) allocation — the reference's
    # submatrix-with-stride pattern (cuda/gemv_benchmark.cu:215)
    parent = rng.uniform(-1, 1, (8, 10)).astype(np.float32)
    r = make_range("f32", "f32", parent, size=(4, 6), stride=10)
    assert r.length(0) == 4 and r.length(1) == 6
    np.testing.assert_array_equal(np.asarray(r.load()), parent[:4, :6])
    assert float(r[2, 3]) == parent[2, 3]
    r.set((1, 5), 7.0)
    assert parent[1, 5] == 7.0


def test_strided_range_flat_carrier(rng):
    flat = rng.uniform(-1, 1, (80,)).astype(np.float32)
    r = make_range("f32", "f32", flat, size=(4, 6), stride=10)
    expect = flat[:40].reshape(4, 10)[:, :6].copy()
    np.testing.assert_array_equal(np.asarray(r.load()), expect)
    assert float(r[3, 2]) == flat[3 * 10 + 2]
    r.set((2, 1), -3.0)
    assert flat[2 * 10 + 1] == -3.0


def test_strided_range_cast_on_load(rng):
    parent = jnp.asarray(rng.uniform(-1, 1, (6, 8)).astype(np.float32)).astype(jnp.bfloat16)
    r = make_range("f32", "bf16", parent, size=(3, 4), stride=8, const=True)
    v = r.load()
    assert v.dtype == jnp.float32
    np.testing.assert_array_equal(
        np.asarray(v), np.asarray(parent[:3, :4].astype(jnp.float32))
    )


def test_strided_range_validation():
    parent = np.zeros((4, 8), np.float32)
    with pytest.raises(ValueError):
        make_range("f32", "f32", parent, size=(4, 6), stride=5)  # stride < n
    with pytest.raises(ValueError):
        make_range("f32", "f32", parent, size=(4, 6), stride=10)  # carrier row len != stride
    with pytest.raises(ValueError):
        make_range("f32", "f32", np.zeros(30, np.float32), size=(4, 6), stride=10)  # flat too small
    with pytest.raises(ValueError):
        # 1-D carrier with no explicit (m, n) size cannot take a stride
        make_range("f32", "f32", np.zeros(80, np.float32), stride=10)


def test_strided_range_updated_jnp(rng):
    parent = jnp.zeros((4, 8), jnp.float32)
    r = make_range("f32", "f32", parent, size=(2, 4), stride=8)
    r2 = r.updated((1, 3), 5.0)
    assert float(r2.data[1, 3]) == 5.0
    assert r2.stride == 8 and r2.shape == (2, 4)


def test_strided_range_composes_with_pallas_blockspec(rng):
    # Inside Pallas the stride composition is the BlockSpec index map over the
    # parent array: the kernel body is written once against a Range and sees
    # only the windowed Ref. Sum an (8, 128) window offset inside a (16, 256)
    # parent.
    from jax.experimental import pallas as pl
    from accblas_tpu.ops.common import interpret_default

    parent = jnp.asarray(rng.uniform(-1, 1, (16, 256)).astype(np.float32))
    spec = ReducedRowMajor("f32", "f32")

    def kernel(a_ref, o_ref):
        r = Range(spec, a_ref, const=True)
        o_ref[0, 0] = jnp.sum(r.load())

    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (1, 1))],  # window at (8, 128)
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret_default(),
    )(parent)
    expect = float(np.sum(np.asarray(parent)[8:16, 128:256], dtype=np.float32))
    assert abs(float(out[0, 0]) - expect) < 1e-3


def test_store_cast_df_to_f64_keeps_lo_word():
    """DF -> f64 storage must keep the full df64 width (hi+lo summed in
    f64), not round through f32 first."""
    from accblas_tpu.ops.df64 import DF

    with jax.enable_x64():
        spec = ReducedRowMajor("df64", "f64")
        v = DF(jnp.float32(1.0), jnp.float32(2.0**-30))
        got = np.asarray(spec.store_cast(v), np.float64)
    assert got == 1.0 + 2.0**-30, got


def test_strided_whole_view_store_writes_only_window():
    flat = np.arange(80, dtype=np.float32)
    r = make_range("f32", "f32", flat, size=(4, 6), stride=10)
    r.store(np.zeros((4, 6), np.float32))
    view = flat[:40].reshape(4, 10)
    assert (view[:, :6] == 0).all()
    # out-of-window columns and the tail of the parent are untouched
    assert (view[:, 6:] == np.arange(80).reshape(8, 10)[:4, 6:]).all()
    assert (flat[40:] == np.arange(40, 80)).all()

    parent = np.arange(48, dtype=np.float32).reshape(6, 8)
    r2 = make_range("f32", "f32", parent, size=(3, 4), stride=8)
    r2.store(-1.0)
    assert (parent[:3, :4] == -1).all()
    assert (parent[:3, 4:] != -1).all() and (parent[3:] != -1).all()


def test_make_range_rejects_f8_arithmetic():
    with pytest.raises(ValueError):
        make_range("f8e4m3", "f8e4m3", np.zeros(8, np.float32))


def test_dense_size_mismatch_rejected():
    with pytest.raises(ValueError):
        make_range("f32", "f32", np.zeros((8, 8), np.float32), size=(4, 4))


def test_range_pytree_survives_vmap():
    """Unflatten must not re-validate transformed/batched leaves."""
    flat = jnp.arange(16, dtype=jnp.float32)
    r = make_range("f32", "f32", flat, size=(2, 4), stride=8)
    out = jax.vmap(lambda leaf: leaf * 2.0)(r.data)
    assert out.shape == (16,)
    # tree_map across the Range itself (unflattens with mapped leaves)
    doubled = jax.tree_util.tree_map(lambda x: x * 2, r)
    assert isinstance(doubled, Range)
    np.testing.assert_array_equal(np.asarray(doubled.data), np.arange(16) * 2)


def test_df64_load_of_overflowing_f64_saturates_not_nan():
    spec = ReducedRowMajor("df64", "f64")
    raw = np.array([1e39, -1e39, 1.5], np.float64)
    got = spec.load_cast(raw)
    s = np.asarray(got.hi, np.float64) + np.asarray(got.lo, np.float64)
    assert np.isinf(s[0]) and s[0] > 0
    assert np.isinf(s[1]) and s[1] < 0
    assert s[2] == 1.5


def test_promote_is_embedding_join():
    from accblas_tpu.accessor import dtypes as dt

    assert dt.promote("bf16", "f16") == "f32"
    assert dt.promote("f8e5m2", "f8e4m3") == "bf16"
    assert dt.promote("f8e5m2", "f16") == "f16"
    assert dt.promote("bf16", "f32") == "f32"
    assert dt.promote("df64", "f32") == "df64"
    assert dt.promote("f64", "df64") == "f64"
