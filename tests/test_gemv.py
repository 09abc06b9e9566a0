"""GEMV kernels vs numpy float64 oracle (BASELINE.json config 2 analogue:
accessor-vs-plain parity, plus mixed-precision pairs, alpha/beta epilogue,
ragged shapes)."""

import numpy as np
import jax.numpy as jnp
import pytest

from accblas_tpu.ops import gemv as gemvops
from accblas_tpu.utils import MatrixInfo, gen_mtx


def _data(m, n, seed=42):
    a64 = gen_mtx(MatrixInfo(m, n), seed=seed)
    x64 = gen_mtx(MatrixInfo(1, n), seed=seed + 1)[0]
    r64 = gen_mtx(MatrixInfo(1, m), seed=seed + 2)[0]
    return a64, x64, r64


def _rel(got, ref):
    return np.linalg.norm(np.asarray(got, np.float64) - ref, 1) / np.linalg.norm(ref, 1)


@pytest.mark.parametrize("m,n", [(256, 512), (512, 256), (300, 700), (64, 100)])
def test_gemv_f32_fixed(m, n):
    a64, x64, r64 = _data(m, n)
    ref = 1.0 * a64 @ x64 + 1.0 * r64
    a = jnp.asarray(a64, jnp.float32)
    x = jnp.asarray(x64, jnp.float32)
    r = jnp.asarray(r64, jnp.float32)
    got = gemvops.gemv(a, x, r, 1.0, 1.0)
    assert got.dtype == jnp.float32
    assert _rel(got, ref) < 1e-5


def test_gemv_alpha_beta_and_beta0():
    m, n = 256, 384
    a64, x64, r64 = _data(m, n, seed=7)
    a = jnp.asarray(a64, jnp.float32)
    x = jnp.asarray(x64, jnp.float32)
    r = jnp.asarray(r64, jnp.float32)
    got = gemvops.gemv(a, x, r, 2.5, -0.5)
    assert _rel(got, 2.5 * a64 @ x64 - 0.5 * r64) < 1e-5
    # beta == 0 must not read res: pass NaNs
    r_nan = jnp.full((m,), np.nan, jnp.float32)
    got0 = gemvops.gemv(a, x, r_nan, 1.0, 0.0)
    assert not np.any(np.isnan(np.asarray(got0)))
    assert _rel(got0, a64 @ x64) < 1e-5


def test_acc_gemv_df64_over_f32():
    m, n = 256, 1024
    a64, x64, r64 = _data(m, n, seed=3)
    a = jnp.asarray(a64, jnp.float32)
    x = jnp.asarray(x64, jnp.float32)
    r = jnp.asarray(r64, jnp.float32)
    # oracle on stored values isolates arithmetic error
    ref_stored = (
        np.asarray(a, np.float64) @ np.asarray(x, np.float64) + np.asarray(r, np.float64)
    )
    got = gemvops.acc_gemv(a, x, r, 1.0, 1.0, ar="df64", precise=True)
    assert got.dtype == jnp.float32
    # result rounds to f32 on store => at the f32 floor, but arithmetic is exact:
    assert _rel(got, ref_stored) < 2e-7
    got_fast = gemvops.acc_gemv(a, x, r, 1.0, 1.0, ar="df64")
    assert _rel(got_fast, ref_stored) < 4e-7


def test_acc_gemv_f32_over_bf16():
    m, n = 256, 512
    a64, x64, r64 = _data(m, n, seed=5)
    ab = jnp.asarray(a64, jnp.float32).astype(jnp.bfloat16)
    xb = jnp.asarray(x64, jnp.float32).astype(jnp.bfloat16)
    r = jnp.asarray(r64, jnp.float32)
    ref_stored = (
        np.asarray(ab.astype(jnp.float32), np.float64)
        @ np.asarray(xb.astype(jnp.float32), np.float64)
        + np.asarray(r, np.float64)
    )
    got = gemvops.acc_gemv(ab, xb, r, 1.0, 1.0, ar="f32")
    assert got.dtype == jnp.float32
    assert _rel(got, ref_stored) < 1e-5


def test_accessor_vs_plain_parity():
    """Accessor f32-over-f32 must equal the plain fixed-precision kernel
    bit-for-bit (same arithmetic, same schedule) — BASELINE.json config 2."""
    m, n = 300, 500
    a64, x64, r64 = _data(m, n, seed=11)
    a = jnp.asarray(a64, jnp.float32)
    x = jnp.asarray(x64, jnp.float32)
    r = jnp.asarray(r64, jnp.float32)
    plain = gemvops.gemv(a, x, r, 1.5, 0.5)
    acc = gemvops.acc_gemv(a, x, r, 1.5, 0.5, ar="f32")
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(acc))


def test_xla_gemv_baseline():
    m, n = 256, 256
    a64, x64, r64 = _data(m, n, seed=13)
    a = jnp.asarray(a64, jnp.float32)
    x = jnp.asarray(x64, jnp.float32)
    r = jnp.asarray(r64, jnp.float32)
    got = gemvops.xla_gemv(a, x, r, 1.0, 1.0)
    assert _rel(got, a64 @ x64 + r64) < 1e-5


def test_gemv_error_floor_property():
    """Accessor<df64, f32> GEMV error ≈ storage floor; fixed f32 larger as n grows."""
    m, n = 128, 4096
    a64, x64, r64 = _data(m, n, seed=17)
    ref = a64 @ x64
    a = jnp.asarray(a64, jnp.float32)
    x = jnp.asarray(x64, jnp.float32)
    z = jnp.zeros((m,), jnp.float32)
    e_acc = _rel(gemvops.acc_gemv(a, x, z, 1.0, 0.0, ar="df64", precise=True), ref)
    e_fixed = _rel(gemvops.gemv(a, x, z, 1.0, 0.0), ref)
    assert e_acc < 3e-7
    assert e_fixed >= e_acc * 0.9  # fixed can't be meaningfully better


def test_acc_gemv_df64_nonpow2_chunks():
    # n/128 = 24 chunks: exercises the odd-peel path of cascaded_fold
    m, n = 64, 3072
    a64, x64, r64 = _data(m, n, seed=23)
    a = jnp.asarray(a64, jnp.float32)
    x = jnp.asarray(x64, jnp.float32)
    r = jnp.asarray(r64, jnp.float32)
    ref = np.asarray(a, np.float64) @ np.asarray(x, np.float64) + np.asarray(r, np.float64)
    got = gemvops.acc_gemv(a, x, r, 1.0, 1.0, ar="df64", precise=True)
    assert _rel(got, ref) < 2e-7


@pytest.mark.parametrize("n", [700, 1477])
def test_gemv_ragged_fullrow_tail(n):
    """Arbitrary (non-lane-multiple) n rides the fullrow kernel's overlapping
    masked tail window — zero-copy, exact (the masked lanes are hard zeros)."""
    m = 72
    a64, x64, r64 = _data(m, n, seed=31)
    a = jnp.asarray(a64, jnp.float32)
    x = jnp.asarray(x64, jnp.float32)
    r = jnp.asarray(r64, jnp.float32)
    ref = np.asarray(a, np.float64) @ np.asarray(x, np.float64) + np.asarray(r, np.float64)
    got32 = gemvops.gemv(a, x, r, 1.0, 1.0)
    assert _rel(got32, ref) < 1e-5
    got_df = gemvops.acc_gemv(a, x, r, 1.0, 1.0, ar="df64", precise=True)
    assert _rel(got_df, ref) < 2e-7


def test_acc_gemv_df64_over_bf16():
    # df64 arithmetic over bf16 storage rides the full-row Kahan path: the
    # arithmetic must be exact on the *stored* (bf16-rounded) values
    m, n = 128, 1024
    a64, x64, r64 = _data(m, n, seed=31)
    a = jnp.asarray(a64, jnp.float32).astype(jnp.bfloat16)
    x = jnp.asarray(x64, jnp.float32).astype(jnp.bfloat16)
    r = jnp.asarray(r64, jnp.float32)
    ref_stored = (
        np.asarray(a.astype(jnp.float32), np.float64)
        @ np.asarray(x.astype(jnp.float32), np.float64)
        + np.asarray(r, np.float64)
    )
    got = gemvops.acc_gemv(a, x, r, 1.0, 1.0, ar="df64", precise=True)
    assert got.dtype == jnp.float32
    assert _rel(got, ref_stored) < 2e-7
    got_fast = gemvops.acc_gemv(a, x, r, 1.0, 1.0, ar="df64")
    assert _rel(got_fast, ref_stored) < 4e-7


def test_acc_gemv_df64_over_f16():
    m, n = 64, 512
    a64, x64, r64 = _data(m, n, seed=37)
    a = jnp.asarray(a64, jnp.float32).astype(jnp.float16)
    x = jnp.asarray(x64, jnp.float32).astype(jnp.float16)
    r = jnp.asarray(r64, jnp.float32)
    ref_stored = (
        np.asarray(a.astype(jnp.float32), np.float64)
        @ np.asarray(x.astype(jnp.float32), np.float64)
        + np.asarray(r, np.float64)
    )
    got = gemvops.acc_gemv(a, x, r, 1.0, 1.0, ar="df64", precise=True)
    assert _rel(got, ref_stored) < 2e-7


def test_acc_gemv_df64_single_chunk():
    # n = 128: exactly one lane chunk -> single Kahan chain
    m, n = 32, 128
    a64, x64, r64 = _data(m, n, seed=41)
    a = jnp.asarray(a64, jnp.float32)
    x = jnp.asarray(x64, jnp.float32)
    r = jnp.asarray(r64, jnp.float32)
    ref = np.asarray(a, np.float64) @ np.asarray(x, np.float64) + np.asarray(r, np.float64)
    got = gemvops.acc_gemv(a, x, r, 1.0, 1.0, ar="df64", precise=True)
    assert _rel(got, ref) < 2e-7


def test_gemv_resident_mode_matches():
    m, n = 200, 1000
    a64, x64, r64 = _data(m, n, seed=47)
    a = jnp.asarray(a64, jnp.float32)
    x = jnp.asarray(x64, jnp.float32)
    r = jnp.asarray(r64, jnp.float32)
    ref = np.asarray(a, np.float64) @ np.asarray(x, np.float64) + np.asarray(r, np.float64)
    got = gemvops.gemv(a, x, r, 1.0, 1.0, resident=True)
    assert _rel(got, ref) < 1e-5
    got_df = gemvops.acc_gemv(a, x, r, 1.0, 1.0, ar="df64", precise=True, resident=True)
    assert _rel(got_df, ref) < 2e-7
    # beta == 0 ignores res
    got_b0 = gemvops.gemv(a, x, jnp.full_like(r, jnp.nan), 1.0, 0.0, resident=True)
    ref_b0 = np.asarray(a, np.float64) @ np.asarray(x, np.float64)
    assert _rel(got_b0, ref_b0) < 1e-5


def test_acc_gemv_resident_bf16_storage():
    m, n = 128, 512
    a64, x64, r64 = _data(m, n, seed=53)
    ab = jnp.asarray(a64, jnp.float32).astype(jnp.bfloat16)
    xb = jnp.asarray(x64, jnp.float32).astype(jnp.bfloat16)
    r = jnp.asarray(r64, jnp.float32)
    ref = (
        np.asarray(ab.astype(jnp.float32), np.float64)
        @ np.asarray(xb.astype(jnp.float32), np.float64)
        + np.asarray(r, np.float64)
    )
    got = gemvops.acc_gemv(ab, xb, r, 1.0, 1.0, ar="f32", resident=True)
    assert _rel(got, ref) < 1e-5
    got_df = gemvops.acc_gemv(ab, xb, r, 1.0, 1.0, ar="df64", resident=True)
    assert _rel(got_df, ref) < 1e-6


@pytest.mark.parametrize("st", ["f8e4m3", "f16"])
@pytest.mark.parametrize("resident", [False, True])
def test_acc_gemv_narrow_storage_tiers(st, resident):
    """f16/f8 storage under f32 arithmetic (MXU path upcasts f8 to bf16 —
    exact) and under df64 arithmetic (fullrow Kahan path)."""
    from accblas_tpu.utils.sr import sr_round
    from accblas_tpu.ops import df64 as dfm

    m, n = 96, 1024
    a64 = gen_mtx(MatrixInfo(m, n), seed=42)
    x64 = gen_mtx(MatrixInfo(1, n), seed=43)[0]
    a = jnp.asarray(sr_round(a64, st, seed=1))
    x = jnp.asarray(sr_round(x64, st, seed=2))
    res = jnp.zeros(m, jnp.float32)
    ref = np.asarray(a, np.float64) @ np.asarray(x, np.float64)
    got = np.asarray(
        gemvops.acc_gemv(a, x, res, 1.0, 0.0, ar="f32", resident=resident),
        np.float64,
    )
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-5
    got_df = np.asarray(
        gemvops.acc_gemv(a, x, res, 1.0, 0.0, ar="df64", resident=resident),
        np.float64,
    )
    assert np.max(np.abs(got_df - ref)) / np.max(np.abs(ref)) < 1e-6


def test_gemv_df64_single_column():
    """n == 1: the resident df64 fast-mode fold has no halving steps — the
    error side-channel must default to zero, not crash (review fix)."""
    from accblas_tpu.ops.df64 import df_to_f32

    m = 64
    a64, x64, r64 = _data(m, 1, seed=91)
    ref = a64 @ x64 + r64
    a = jnp.asarray(a64, jnp.float32)
    x = jnp.asarray(x64, jnp.float32)
    r = jnp.asarray(r64, jnp.float32)
    got = gemvops.acc_gemv(a, x, r, 1.0, 1.0, ar="df64", resident=True)
    assert _rel(got, ref) < 1e-6
    df = gemvops.acc_gemv(a, x, r, 1.0, 1.0, ar="df64", resident=True,
                          df_out=True)
    assert _rel(df_to_f32(df), ref) < 1e-6


def test_gemv_df_chunked_matches_single():
    """The column-chunked df_out fallback (operands past the fullrow VMEM
    budget, e.g. large per-chip shards in parallel.pgemv) is exactly the
    single-call result: unrounded DF partials + df_add is associative-exact
    here because every partial is exact to the fold's compensation."""
    from accblas_tpu.ops.df64 import df_to_f64
    from accblas_tpu.ops.gemv import _gemv_df_chunked

    m, n = 32, 640
    a64, x64, r64 = _data(m, n, seed=92)
    a = jnp.asarray(a64, jnp.float32)
    x = jnp.asarray(x64, jnp.float32)
    r = jnp.asarray(r64, jnp.float32)
    # oracle over the f32-rounded STORAGE values: df64 arithmetic is exact
    # far below the storage floor, so the fp64 master would differ at ~3e-8
    ref = (2.0 * np.asarray(a, np.float64) @ np.asarray(x, np.float64)
           + 0.5 * np.asarray(r, np.float64))
    single = gemvops.acc_gemv(a, x, r, 2.0, 0.5, ar="df64", precise=True,
                              resident=False, df_out=True)
    chunked = _gemv_df_chunked(a, x, r, 2.0, 0.5, True, True, 256)
    # the fullrow kernel's Kahan chains target the f32 STORAGE floor (the
    # reference's ~4e-8 plot value), not full df64 width — the chunked
    # combine must land in the same class as the single call (it is often
    # better: short chunks have fewer compensated steps)
    nrm = np.linalg.norm(ref, 1)
    assert np.linalg.norm(df_to_f64(chunked) - ref, 1) / nrm < 1e-7
    assert np.linalg.norm(df_to_f64(single) - ref, 1) / nrm < 1e-7
    assert np.linalg.norm(df_to_f64(chunked) - df_to_f64(single), 1) / nrm < 1e-7


def test_gemv_fixed_mixed_dtypes_rejected():
    a64, x64, r64 = _data(32, 64, seed=93)
    a = jnp.asarray(a64, jnp.float32).astype(jnp.bfloat16)
    x = jnp.asarray(x64, jnp.float32)
    r = jnp.asarray(r64, jnp.float32)
    with pytest.raises(ValueError, match="matching storage dtypes"):
        gemvops.gemv(a, x, r)


def test_xla_gemv_beta0_ignores_res():
    """cublasSgemv semantics: beta == 0 must not read res (an uninitialized
    buffer full of NaN must not poison the output)."""
    m, n = 64, 128
    a64, x64, _ = _data(m, n, seed=94)
    ref = 1.5 * a64 @ x64
    a = jnp.asarray(a64, jnp.float32)
    x = jnp.asarray(x64, jnp.float32)
    r_nan = jnp.full((m,), jnp.nan, jnp.float32)
    got = gemvops.xla_gemv(a, x, r_nan, 1.5, 0.0)
    assert np.all(np.isfinite(np.asarray(got)))
    assert _rel(got, ref) < 1e-5


def test_acc_gemv_precise_correctly_rounded():
    """precise=True must be correctly rounded vs the exact fp64-over-f32
    ideal (the reference's Acc<fp64,fp32> arithmetic): Kahan's fast2sum
    capture leaked 0.3-6 ulp32 when the row sum wandered through zero —
    precise now uses the branch-free two_sum chain (round 4)."""
    import jax

    from accblas_tpu.utils import devgen

    n = 512
    a32 = devgen.gen_f32((n, n), 42, "gemv_a")
    x32 = devgen.gen_f32((n,), 42, "gemv_x")
    r32 = devgen.gen_f32((n,), 42, "gemv_res")
    ideal = (
        np.asarray(a32, np.float64) @ np.asarray(x32, np.float64)
        + np.asarray(r32, np.float64)
    )
    ideal_st = ideal.astype(np.float32)
    out = jax.jit(
        lambda a, x, r: gemvops.acc_gemv(a, x, r, 1.0, 1.0, ar="df64",
                                         precise=True)
    )(a32, x32, r32)
    np.testing.assert_array_equal(np.asarray(out), ideal_st)
