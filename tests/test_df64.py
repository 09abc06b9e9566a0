"""df64 double-float arithmetic vs numpy float64 oracle.

The oracle role here is the one fp64+cuBLAS plays in the reference's in-driver
error harness (SURVEY.md §4): numpy float64 is the ground truth.
"""

import numpy as np
import jax
import jax.numpy as jnp

from accblas_tpu.ops import df64
from accblas_tpu.ops.df64 import DF


def _rand(rng, shape):
    return rng.uniform(-1.0, 1.0, size=shape).astype(np.float32)


def test_two_sum_exact(rng):
    a = jnp.asarray(_rand(rng, (128,)))
    b = jnp.asarray(_rand(rng, (128,)) * 1e-5)
    s, e = df64.two_sum(a, b)
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    recon = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(recon, exact)


def test_two_prod_exact(rng):
    a = jnp.asarray(_rand(rng, (256,)))
    b = jnp.asarray(_rand(rng, (256,)))
    p, e = df64.two_prod(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    recon = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    # fp32 products of fp32 inputs are exactly representable in fp64
    np.testing.assert_array_equal(recon, exact)


def test_df_add_mul_accuracy(rng):
    a64 = rng.uniform(-1, 1, 512)
    b64 = rng.uniform(-1, 1, 512)
    a = df64.df_from(jnp.asarray(a64.astype(np.float32)))
    b = df64.df_from(jnp.asarray(b64.astype(np.float32)))
    a_ref = np.asarray(a.hi, np.float64)
    b_ref = np.asarray(b.hi, np.float64)

    s = df64.df_add(a, b)
    np.testing.assert_allclose(df64.df_to_f64(s), a_ref + b_ref, rtol=0, atol=0)

    p = df64.df_mul(a, b)
    np.testing.assert_allclose(df64.df_to_f64(p), a_ref * b_ref, rtol=3e-15)


def test_df_sum_flat_error(rng):
    # compensated sum error must stay ~2^-48, far below fp32 and flat in n
    for n in (10_000, 1_000_000):
        x32 = _rand(rng, (n,))
        x = df64.df_from(jnp.asarray(x32))
        got = df64.df_to_f64(df64.df_sum(x))
        ref = np.sum(np.asarray(x32, np.float64))
        rel = abs(got - ref) / abs(ref)
        assert rel < 1e-12, (n, rel)


def test_df_sum_axis(rng):
    x32 = _rand(rng, (33, 64))
    x = df64.df_from(jnp.asarray(x32))
    got = df64.df_to_f64(df64.df_sum(df64.df_sum(x, axis=0)))
    ref = np.sum(np.asarray(x32, np.float64))
    assert abs(got - ref) / abs(ref) < 1e-12


def test_df_dot_beats_fp32(rng):
    n = 1_000_000
    x32 = _rand(rng, (n,))
    y32 = _rand(rng, (n,))
    x64 = np.asarray(x32, np.float64)
    y64 = np.asarray(y32, np.float64)
    ref = x64 @ y64

    # df64 dot: exact products via two_prod, compensated fold
    p, e = df64.df_mul(df64.df_from(jnp.asarray(x32)), df64.df_from(jnp.asarray(y32))).hi, None
    prod = df64.df_mul(df64.df_from(jnp.asarray(x32)), df64.df_from(jnp.asarray(y32)))
    got = df64.df_to_f64(df64.df_sum(prod))
    rel_df = abs(got - ref) / abs(ref)

    naive = float(jnp.dot(jnp.asarray(x32), jnp.asarray(y32)))
    rel_f32 = abs(naive - ref) / abs(ref)

    assert rel_df < 1e-12
    assert rel_df < rel_f32 / 100


def test_df_pytree_and_operators(rng):
    a = df64.df_from(jnp.asarray(_rand(rng, (8,))))
    b = df64.df_from(jnp.asarray(_rand(rng, (8,))))

    @jax.jit
    def f(a, b):
        return a * b + a - b * 2.0

    out = f(a, b)
    assert isinstance(out, DF)
    a64 = np.asarray(a.hi, np.float64)
    b64 = np.asarray(b.hi, np.float64)
    np.testing.assert_allclose(df64.df_to_f64(out), a64 * b64 + a64 - 2 * b64, rtol=1e-13, atol=1e-14)


def test_cascaded_fold_arbitrary_sizes(rng):
    for rows in (24, 7, 33, 8, 128):
        p = jnp.asarray(_rand(rng, (rows, 128)))
        out = df64.cascaded_fold(p, out_rows=8)
        assert out.hi.shape == (8, 128)
        got = np.asarray(out.hi, np.float64).sum(0) + np.asarray(out.lo, np.float64).sum(0)
        ref = np.asarray(p, np.float64).sum(0)
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)

    # exactness: fold to 1 row and compare against fp64
    p = jnp.asarray(_rand(rng, (24, 128)))
    out = df64.cascaded_fold(p, out_rows=1)
    got = np.asarray(out.hi, np.float64)[0] + np.asarray(out.lo, np.float64)[0]
    np.testing.assert_allclose(got, np.asarray(p, np.float64).sum(0), rtol=1e-12)


def test_two_prod_mask_split_exact_bulk():
    """The mask-split two_prod must be a true EFT: p + e == a*b exactly over
    a large random sample (the property the df64 precise tiers build on)."""
    rng = np.random.default_rng(7)
    a = rng.uniform(-1, 1, 1_000_000).astype(np.float32)
    b = rng.uniform(-1, 1, 1_000_000).astype(np.float32)
    p, e = df64.two_prod(jnp.asarray(a), jnp.asarray(b))
    exact = a.astype(np.float64) * b.astype(np.float64)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    assert np.array_equal(got, exact)
    # and across magnitudes (exponent spread kept inside the universal EFT
    # validity range: any two_prod's error term underflows to subnormal for
    # |a*b| < ~2^-104, mask-split and multiply-split alike)
    a2 = (a * np.float32(2.0) ** rng.integers(-25, 25, a.shape)).astype(np.float32)
    b2 = (b * np.float32(2.0) ** rng.integers(-25, 25, b.shape)).astype(np.float32)
    p2, e2 = df64.two_prod(jnp.asarray(a2), jnp.asarray(b2))
    exact2 = a2.astype(np.float64) * b2.astype(np.float64)
    got2 = np.asarray(p2, np.float64) + np.asarray(e2, np.float64)
    assert np.array_equal(got2, exact2)


def test_veltkamp_split_huge_magnitudes():
    """The scalar/narrow-shape fallback split must survive |a| > 2^115 (where
    an unscaled Veltkamp split overflows to NaN error terms) — shape (n, 1)
    forces the multiply-split path in two_prod."""
    a = jnp.asarray(np.array([[2.0**120], [-2.0**125], [3.0]], np.float32))
    b = jnp.asarray(np.array([[2.0**-100], [2.0**-110], [0.5]], np.float32))
    p, e = df64.two_prod(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, exact)


def test_df_mul_scalar_fast_path():
    """DF * f32 scalar must take df_mul_f32 (not promote to a full df_mul)
    and stay exact."""
    rng = np.random.default_rng(3)
    x = df64.df_from(jnp.asarray(rng.uniform(-1, 1, 64).astype(np.float32)))
    y = np.float32(1.7)
    via_op = x * float(y)
    via_fn = df64.df_mul_f32(x, jnp.float32(y))
    np.testing.assert_array_equal(np.asarray(via_op.hi), np.asarray(via_fn.hi))
    np.testing.assert_array_equal(np.asarray(via_op.lo), np.asarray(via_fn.lo))
    ref = np.asarray(x.hi, np.float64) * np.float64(y)
    np.testing.assert_allclose(df64.df_to_f64(via_op), ref, rtol=1e-13)


def test_df_fold_rows_rejects_unreachable_target():
    import pytest

    x = df64.df_from(jnp.ones((8, 128), jnp.float32))
    with pytest.raises(AssertionError):
        df64.df_fold_rows(x, out_rows=3)
    with pytest.raises(AssertionError):
        df64.df_fold_lanes(x, out_lanes=3)
    # power-of-two targets still work
    assert df64.df_fold_rows(x, out_rows=2).shape == (2, 128)
    assert df64.df_fold_lanes(x, out_lanes=32).shape == (8, 32)


def test_df_sum_axis_odd_lengths():
    """Odd fold leftovers on the int-axis path (now concatenate-carried, no
    scatter) must stay exact-class for every small length."""
    rng = np.random.default_rng(11)
    for n in (2, 3, 5, 7, 9, 33):
        x32 = rng.uniform(-1, 1, (n, 16)).astype(np.float32)
        x = df64.df_from(jnp.asarray(x32))
        got = df64.df_to_f64(df64.df_sum(x, axis=0))
        ref = np.asarray(x32, np.float64).sum(0)
        np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-14)
