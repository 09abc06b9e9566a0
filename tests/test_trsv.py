"""TRSV kernels vs scipy/numpy float64 oracle.

Mirrors the reference benchmark setup (``cuda/trsv_memory.cuh:150-163``): a
random uniform(-1,1) matrix is LU-factorized in fp64 so its triangles are
realistic L/U factors, then the packed factor matrix is handed to TRSV
(upper/unit is the benchmark default, ``cuda/trsv_benchmark.cu:26-27``)."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.linalg

from accblas_tpu.ops import trsv as trsvops
from accblas_tpu.utils import MatrixInfo, gen_mtx


def _packed_lu(n, seed=42):
    # diagonally-dominant so BOTH triangles of the packed factor are well
    # conditioned even in unit-diagonal mode (the reference's raw
    # uniform(-1,1) getrf factor makes upper/unit exponentially ill-
    # conditioned — fine for timing, useless as a correctness oracle)
    a64 = gen_mtx(MatrixInfo(n, n), seed=seed)
    a64 += np.eye(n) * (0.25 * n)
    lu, _ = scipy.linalg.lu_factor(a64)
    b64 = gen_mtx(MatrixInfo(1, n), seed=seed + 1)[0]
    return lu, b64


def _ref_solve(lu, b, uplo, unit):
    n = lu.shape[0]
    t = np.tril(lu) if uplo == "lower" else np.triu(lu)
    if unit:
        np.fill_diagonal(t, 1.0)
    return scipy.linalg.solve_triangular(t, b, lower=(uplo == "lower"), unit_diagonal=False)


def _rel(got, ref):
    return np.linalg.norm(np.asarray(got, np.float64) - ref, 1) / np.linalg.norm(ref, 1)


@pytest.mark.parametrize("uplo,unit", [("upper", True), ("lower", True), ("upper", False), ("lower", False)])
def test_trsv_f32_all_modes(uplo, unit):
    n = 512  # 2 blocks
    lu, b64 = _packed_lu(n)
    ref = _ref_solve(lu, b64, uplo, unit)
    a = jnp.asarray(lu, jnp.float32)
    b = jnp.asarray(b64, jnp.float32)
    got = trsvops.trsv(a, b, uplo=uplo, unit=unit)
    assert _rel(got, ref) < 5e-5, (uplo, unit)


def test_trsv_multiblock_and_ragged():
    # upper/non-unit and lower/unit are the naturally well-conditioned modes
    # of an LU-packed factor (unit-upper discards the real diagonal and is
    # exponentially ill-conditioned at any size)
    for n, uplo, unit in ((1024, "upper", False), (1024, "lower", True), (700, "upper", False)):
        lu, b64 = _packed_lu(n, seed=7)
        ref = _ref_solve(lu, b64, uplo, unit)
        got = trsvops.trsv(
            jnp.asarray(lu, jnp.float32), jnp.asarray(b64, jnp.float32), uplo=uplo, unit=unit
        )
        assert _rel(got, ref) < 1e-4, (n, uplo, unit)


def test_trsv_ragged_zero_copy_sweep():
    # non-block-multiple n through the unpadded sweep (boundary tiles are
    # OOB-masked in-kernel): f32, bf16 storage, and the df64 fused tier
    n = 700
    lu, b64 = _packed_lu(n, seed=11)
    ref = _ref_solve(lu, b64, "upper", False)
    a32 = jnp.asarray(lu, jnp.float32)
    b32 = jnp.asarray(b64, jnp.float32)
    got = trsvops.trsv(a32, b32, unit=False, resident=False)
    assert _rel(got, ref) < 1e-4
    got_bf = trsvops.acc_trsv(
        jnp.asarray(lu, jnp.bfloat16), b32, unit=False, resident=False
    )
    assert _rel(got_bf, ref) < 5e-2
    got_df = trsvops.acc_trsv(a32, b32, unit=False, ar="df64", resident=False)
    assert _rel(got_df, ref) < _rel(got, ref)
    # lower/unit exercises the un-reversed sweep ordering on the ragged edge
    ref_l = _ref_solve(lu, b64, "lower", True)
    got_l = trsvops.trsv(a32, b32, uplo="lower", unit=True, resident=False)
    assert _rel(got_l, ref_l) < 1e-4


def test_trsm_ragged_zero_copy():
    n, k = 700, 5
    lu, _ = _packed_lu(n, seed=13)
    rng = np.random.default_rng(3)
    bmat = rng.standard_normal((n, k))
    import scipy.linalg as sla

    ref = sla.solve_triangular(np.triu(lu), bmat, lower=False, unit_diagonal=False)
    got = trsvops.trsm(
        jnp.asarray(lu, jnp.float32), jnp.asarray(bmat, jnp.float32),
        unit=False, resident=False,
    )
    assert _rel(got, ref) < 1e-4


def test_acc_trsv_f32_over_bf16():
    n = 512
    lu, b64 = _packed_lu(n, seed=3)
    ab = jnp.asarray(lu, jnp.float32).astype(jnp.bfloat16)
    b = jnp.asarray(b64, jnp.float32)
    # oracle on the stored (bf16-rounded) triangle
    lu_st = np.asarray(ab.astype(jnp.float32), np.float64)
    ref = _ref_solve(lu_st, b64, "upper", False)
    got = trsvops.acc_trsv(ab, b, uplo="upper", unit=False, ar="f32")
    assert got.dtype == jnp.float32
    assert _rel(got, ref) < 1e-3  # bf16 storage floor through a recurrence


def test_acc_trsv_df64_refinement_beats_f32():
    n = 768
    lu, b64 = _packed_lu(n, seed=11)
    ref = _ref_solve(lu, b64, "upper", False)
    a = jnp.asarray(lu, jnp.float32)
    b = jnp.asarray(b64, jnp.float32)
    e_f32 = _rel(trsvops.trsv(a, b, unit=False), ref)
    e_ref = _rel(trsvops.acc_trsv(a, b, unit=False, ar="df64"), ref)
    # both sit at the f32 forward-error floor for this well-conditioned n;
    # refinement must not be meaningfully worse and must be at the floor
    # (at larger n / worse conditioning the error sweeps show it 2-3x better)
    assert e_ref <= max(3 * e_f32, 5e-7)
    assert e_ref < 5e-6


def test_acc_trsv_df64_fused_sweep_multiblock():
    """The one-pass df64 sweep (DF-carried panels) vs the fp64 oracle: must
    sit at/below the f32 tier's error and track the storage floor."""
    n = 1024  # 2 sweep blocks: exercises DF publish + cross-block corrections
    lu, b64 = _packed_lu(n, seed=61)
    ref = _ref_solve(lu, b64, "upper", False)
    a = jnp.asarray(lu, jnp.float32)
    b = jnp.asarray(b64, jnp.float32)
    # resident=False forces the fused sweep even where refinement would apply
    e_df = _rel(trsvops.acc_trsv(a, b, unit=False, ar="df64", resident=False), ref)
    e_f32 = _rel(trsvops.trsv(a, b, unit=False, resident=False), ref)
    assert e_df <= max(e_f32, 5e-7)
    assert e_df < 5e-6


def test_acc_trsm_df64_fused():
    """df64 TRSM rides the same one-pass sweep (no per-column residual loop)."""
    n, k = 768, 12
    lu, _ = _packed_lu(n, seed=67)
    B64 = gen_mtx(MatrixInfo(k, n), seed=71).T
    ref = _ref_solve_multi(lu, B64, "upper", False)
    got = trsvops.acc_trsm(
        jnp.asarray(lu, jnp.float32), jnp.asarray(B64, jnp.float32),
        uplo="upper", unit=False, ar="df64",
    )
    rel = np.linalg.norm(np.asarray(got, np.float64) - ref) / np.linalg.norm(ref)
    got32 = trsvops.trsm(
        jnp.asarray(lu, jnp.float32), jnp.asarray(B64, jnp.float32),
        uplo="upper", unit=False,
    )
    rel32 = np.linalg.norm(np.asarray(got32, np.float64) - ref) / np.linalg.norm(ref)
    assert rel <= max(rel32, 5e-7)
    assert rel < 5e-6


@pytest.mark.parametrize("uplo", ["upper", "lower"])
def test_acc_trsv_df64_fused_lower_upper(uplo):
    n = 512
    lu, b64 = _packed_lu(n, seed=73)
    unit = uplo == "lower"  # the well-conditioned mode per triangle
    ref = _ref_solve(lu, b64, uplo, unit)
    got = trsvops.acc_trsv(
        jnp.asarray(lu, jnp.float32), jnp.asarray(b64, jnp.float32),
        uplo=uplo, unit=unit, ar="df64", resident=False,
    )
    assert _rel(got, ref) < 5e-6


def test_tri_gemv_df64_residual():
    """Standalone df64-exact triangular residual r = b - T x (the building
    block for user-level iterative refinement; formerly acc_trsv's
    refinement pass, now a library op in its own right)."""
    from accblas_tpu.ops.tri_gemv import tri_gemv_df64

    n = 700  # exercises the 512-block padding
    lu, b64 = _packed_lu(n, seed=83)
    t = np.triu(lu)
    a = jnp.asarray(lu, jnp.float32)
    b = jnp.asarray(b64, jnp.float32)
    x64 = gen_mtx(MatrixInfo(1, n), seed=89)[0]
    x = jnp.asarray(x64, jnp.float32)
    ref = np.asarray(b, np.float64) - np.asarray(t, np.float64) @ np.asarray(
        x, np.float64
    )
    # the residual itself is heavily cancelled; df64 carry must hold it to
    # ~f32-product-rounding of the ROW SUMS, far below naive f32 evaluation
    got = np.asarray(tri_gemv_df64(a, x, b, uplo="upper", unit=False), np.float64)
    denom = np.linalg.norm(np.asarray(t @ np.asarray(x, np.float64), np.float64), 1)
    assert np.linalg.norm(got - ref, 1) / denom < 1e-6


def test_bf16_envelope_warns():
    n = 2048
    lu, b64 = _packed_lu(n, seed=79)
    ab = jnp.asarray(lu, jnp.float32).astype(jnp.bfloat16)
    b = jnp.asarray(b64, jnp.float32)
    with pytest.warns(UserWarning, match="bf16-storage"):
        trsvops.acc_trsv(ab, b, unit=False, ar="f32")
    # opt-in silences; df64 arithmetic doesn't warn (its carry is exact)
    import warnings as w

    with w.catch_warnings():
        w.simplefilter("error")
        trsvops.acc_trsv(ab, b, unit=False, ar="f32", unstable_ok=True)


def test_xla_trsv_baseline():
    n = 512
    lu, b64 = _packed_lu(n, seed=13)
    ref = _ref_solve(lu, b64, "upper", False)
    got = trsvops.xla_trsv(jnp.asarray(lu, jnp.float32), jnp.asarray(b64, jnp.float32), unit=False)
    assert _rel(got, ref) < 5e-5


def _ref_solve_multi(lu, B, uplo, unit):
    t = np.tril(lu) if uplo == "lower" else np.triu(lu)
    if unit:
        np.fill_diagonal(t, 1.0)
    return scipy.linalg.solve_triangular(t, B, lower=(uplo == "lower"), unit_diagonal=False)


@pytest.mark.parametrize("uplo,unit", [("upper", False), ("lower", True)])
def test_trsm_multi_rhs(uplo, unit):
    n, k = 512, 12  # k not a sublane multiple: exercises rhs padding
    lu, _ = _packed_lu(n, seed=17)
    B64 = gen_mtx(MatrixInfo(k, n), seed=19).T  # (n, k)
    ref = _ref_solve_multi(lu, B64, uplo, unit)
    got = trsvops.trsm(
        jnp.asarray(lu, jnp.float32), jnp.asarray(B64, jnp.float32), uplo=uplo, unit=unit
    )
    assert got.shape == (n, k)
    rel = np.linalg.norm(np.asarray(got, np.float64) - ref) / np.linalg.norm(ref)
    assert rel < 1e-4


def test_trsm_matches_trsv_per_column():
    n, k = 384, 3
    lu, _ = _packed_lu(n, seed=23)
    B64 = gen_mtx(MatrixInfo(k, n), seed=29).T
    a = jnp.asarray(lu, jnp.float32)
    Bj = jnp.asarray(B64, jnp.float32)
    X = trsvops.trsm(a, Bj, uplo="upper", unit=False)
    for c in range(k):
        xc = trsvops.trsv(a, Bj[:, c], uplo="upper", unit=False)
        np.testing.assert_allclose(
            np.asarray(X[:, c]), np.asarray(xc), rtol=1e-5, atol=1e-6
        )


def test_acc_trsm_bf16_storage():
    n, k = 512, 8
    lu, _ = _packed_lu(n, seed=31)
    ab = jnp.asarray(lu, jnp.float32).astype(jnp.bfloat16)
    B64 = gen_mtx(MatrixInfo(k, n), seed=37).T
    lu_st = np.asarray(ab.astype(jnp.float32), np.float64)
    ref = _ref_solve_multi(lu_st, B64, "upper", False)
    got = trsvops.acc_trsm(ab, jnp.asarray(B64, jnp.float32), uplo="upper", unit=False, ar="f32")
    rel = np.linalg.norm(np.asarray(got, np.float64) - ref) / np.linalg.norm(ref)
    assert rel < 1e-3


def test_acc_trsm_narrow_multirhs_blocked_route():
    """Round-5 probe_r5p reroute: narrow-storage panels at 1 < k < 32 and
    n > RESIDENT_N auto-route onto the blocked schedule (BLOCK_VEC=1024
    blocks). Numerics of the newly-routed branch vs a per-column fp64
    solve of the quantized operand, and vs the sweep route (resident=False)
    on the same operand — same error class required."""
    n, k = 2176, 8
    lu, _ = _packed_lu(n, seed=53)
    ab = jnp.asarray(lu, jnp.float32).astype(jnp.bfloat16)
    B64 = gen_mtx(MatrixInfo(k, n), seed=59).T
    B = jnp.asarray(B64, jnp.float32)
    lu_st = np.asarray(ab.astype(jnp.float32), np.float64)
    ref = _ref_solve_multi(lu_st, B64, "upper", False)

    import accblas_tpu.ops.trsv as tv
    # the per-slice narrow block choice the TPU autoroute would take
    assert tv._small_block_for(n, k, False) == tv.BLOCK_VEC
    routed = trsvops.acc_trsm(ab, B, uplo="upper", unit=False, ar="f32",
                              resident=True, unstable_ok=True)
    swept = trsvops.acc_trsm(ab, B, uplo="upper", unit=False, ar="f32",
                             resident=False, unstable_ok=True)

    def rel(x):
        return (np.linalg.norm(np.asarray(x, np.float64) - ref)
                / np.linalg.norm(ref))

    r_blk, r_swp = rel(routed), rel(swept)
    assert np.isfinite(r_blk) and r_blk < 1e-2, r_blk
    assert r_blk < 10 * max(r_swp, 1e-7), (r_blk, r_swp)


def test_trsm_wide_rhs_group_split():
    # k > the scratch-budget group size at this n would need a huge n; instead
    # force grouping by monkeypatching the budget
    import accblas_tpu.ops.trsv as tv

    n, k = 256, 24
    lu, _ = _packed_lu(n, seed=41)
    B64 = gen_mtx(MatrixInfo(k, n), seed=43).T
    old = tv._TRSM_SCR_BYTES
    tv._TRSM_SCR_BYTES = 4 * n * 8 * 2  # group = 16 columns
    try:
        got = tv.trsm(jnp.asarray(lu, jnp.float32), jnp.asarray(B64, jnp.float32), uplo="upper", unit=False)
    finally:
        tv._TRSM_SCR_BYTES = old
    ref = _ref_solve_multi(lu, B64, "upper", False)
    rel = np.linalg.norm(np.asarray(got, np.float64) - ref) / np.linalg.norm(ref)
    assert rel < 1e-4


@pytest.mark.parametrize("ar", ["f32", "df64"])
def test_trsm_rhs_chunk_gate_exact(ar):
    # the round-5 compile-envelope guard: at n >= _TRSM_CHUNK_N panels wider
    # than _TRSM_CHUNK_K solve in chunked column groups (trsm_rhs512.log:
    # n=16384 k=512 RESOURCE_EXHAUSTs every tier un-chunked). Columns are
    # independent, so the chunked result must match the un-chunked one
    # column-for-column — pinned here at small shapes by lowering the gate,
    # including a ragged last chunk (k=20 -> 8+8+4).
    import accblas_tpu.ops.trsv as tv

    n, k = 256, 20
    lu, _ = _packed_lu(n, seed=59)
    a = jnp.asarray(lu, jnp.float32)
    B = jnp.asarray(gen_mtx(MatrixInfo(k, n), seed=61).T, jnp.float32)
    plain = tv.acc_trsm(a, B, uplo="upper", unit=False, ar=ar)
    old_n, old_k = tv._TRSM_CHUNK_N, tv._TRSM_CHUNK_K
    tv._TRSM_CHUNK_N, tv._TRSM_CHUNK_K = n, 8
    try:
        chunked = tv.acc_trsm(a, B, uplo="upper", unit=False, ar=ar)
    finally:
        tv._TRSM_CHUNK_N, tv._TRSM_CHUNK_K = old_n, old_k
    assert chunked.shape == plain.shape
    np.testing.assert_allclose(
        np.asarray(chunked, np.float64), np.asarray(plain, np.float64),
        rtol=0, atol=1e-6,
    )
    ref = _ref_solve_multi(lu, np.asarray(B, np.float64), "upper", False)
    rel = np.linalg.norm(np.asarray(chunked, np.float64) - ref) / np.linalg.norm(ref)
    assert rel < 1e-4


def test_xla_trsm_baseline():
    n, k = 256, 4
    lu, _ = _packed_lu(n, seed=47)
    B64 = gen_mtx(MatrixInfo(k, n), seed=53).T
    ref = _ref_solve_multi(lu, B64, "upper", False)
    got = trsvops.xla_trsm(jnp.asarray(lu, jnp.float32), jnp.asarray(B64, jnp.float32), unit=False)
    rel = np.linalg.norm(np.asarray(got, np.float64) - ref) / np.linalg.norm(ref)
    assert rel < 5e-5


@pytest.mark.parametrize("uplo,unit", [("upper", False), ("lower", False), ("upper", True)])
def test_trsv_resident_mode_matches(uplo, unit):
    n = 700  # non-block-multiple exercises padding in the resident path
    lu, b64 = _packed_lu(n, seed=59)
    ref = _ref_solve(lu, b64, uplo, unit)
    a = jnp.asarray(lu, jnp.float32)
    b = jnp.asarray(b64, jnp.float32)
    got = trsvops.trsv(a, b, uplo=uplo, unit=unit, resident=True)
    assert _rel(got, ref) < 1e-4
    # must agree with the Pallas sweep to f32-roundoff levels; the unit
    # triangle of an LU factor is worse-conditioned, and the resident mode's
    # 256-wide block inverses amplify more than the sweep's 64-wide leaves
    got_sweep = trsvops.trsv(a, b, uplo=uplo, unit=unit, resident=False)
    assert _rel(got, np.asarray(got_sweep, np.float64)) < (5e-5 if unit else 1e-5)


def test_trsv_small_narrow_storage_tiers():
    """The blocked-XLA schedule solves narrow-storage triangles at their
    storage error floor (f32 arithmetic, cast-on-load per slice for k<32,
    one upfront cast for k>=32 panels — both exact given f32 arithmetic).
    Routing measured on hardware in probe_r3h/r3j (bf16 685 GF/s at 24576
    vs the sweep's 398); here the numerics on a 700-row LU factor."""
    n = 700
    lu, b64 = _packed_lu(n)
    ref = _ref_solve(lu, b64, "upper", False)
    b = jnp.asarray(b64, jnp.float32)
    # f8 single-rhs routes here too since round 5 (probe_r5k: 973 vs the
    # sweep's 121 GF/s at 24576); measured CPU floors at this seed are
    # 6.0e-3 (e4m3) / 9.4e-2 (e5m2) — tols carry ~3x margin. The values
    # are clipped to the e4m3 max first (no inf in e4m3fn: raw astype of
    # an overflowing entry makes nan).
    floors = {jnp.bfloat16: 5e-3, jnp.float16: 6e-4, jnp.float32: 5e-7,
              jnp.float8_e4m3fn: 2e-2, jnp.float8_e5m2: 3e-1}
    for dt, tol in floors.items():
        a = jnp.asarray(np.clip(lu, -448, 448), dt)
        got = trsvops._trsv_small(a, b, "upper", False, "f32")
        assert _rel(got, ref) < tol, dt
        # k=64 hits the upfront-cast panel branch; column 0 must match the
        # single-rhs solve bit-for-bit in the k<32 per-slice regime too
        B = jnp.asarray(np.stack([b64, -b64], 1), jnp.float32)
        B = jnp.concatenate([B] * 32, 1)  # (n, 64)
        gotm = trsvops._trsv_small(a, B, "upper", False, "f32")
        assert _rel(gotm[:, 0], ref) < tol, dt
        np.testing.assert_allclose(
            np.asarray(gotm[:, 0], np.float64), -np.asarray(gotm[:, 1], np.float64)
        )


def test_use_small_routing_gate(monkeypatch):
    """Auto-routing (TPU backend): every single-rhs solve (f8 included
    since round 5 — probe_r5k measured the blocked route at 973 vs the
    sweep's 121 GF/s at 24576) and every k>=32 panel ride the blocked-XLA
    schedule; explicit resident=False / interpret=True always reach the
    sweep."""
    import accblas_tpu.ops.trsv as tv

    monkeypatch.setattr(tv.jax, "default_backend", lambda: "tpu")
    big = tv.RESIDENT_N + 1
    # single-rhs autoroutes for every storage dtype
    for st in ("f32", "bf16", "f16", "f8e4m3", "f8e5m2"):
        assert tv._use_small(big, None, None, "f32", k=1, st=st)
    # round-4 reroute: aligned large-n f32 single-rhs rides the Pallas
    # sweep (probe_r4g_hw: 362.6 vs 340.7 GF/s at 24576); ragged n, narrow
    # storage, and sub-8192 sizes stay on the blocked schedule
    assert not tv._use_small(24576, None, None, "f32", k=1, st="f32")
    assert not tv._use_small(8192, None, None, "f32", k=1, st="f32")
    assert tv._use_small(24500, None, None, "f32", k=1, st="f32")
    assert tv._use_small(4096, None, None, "f32", k=1, st="f32")
    assert tv._use_small(24576, None, None, "f32", k=1, st="bf16")
    # wide panels autoroute regardless of storage; narrow-storage panels
    # at 1 < k < 32 do too since round 5 (probe_r5p: blocked b=1024 runs
    # bf16 4510/8914 and f8 4772/9406 vs the sweep's 2914/5699 and
    # 941/1870 GF/s at k=8/16, n=16384); f32 keeps the sweep there
    # (probe_r3g k=16 tie)
    assert tv._use_small(big, None, None, "f32", k=32, st="f8e4m3")
    assert tv._use_small(big, None, None, "f32", k=8, st="f8e4m3")
    assert tv._use_small(16384, None, None, "f32", k=16, st="bf16")
    assert not tv._use_small(16384, None, None, "f32", k=8, st="f32")
    # VMEM-resident n routes for any storage
    assert tv._use_small(tv.RESIDENT_N, None, None, "f32", k=8, st="f8e4m3")
    # df64 arithmetic always uses the fused Pallas sweep
    assert not tv._use_small(big, None, None, "df64", k=1, st="f32")
    # explicit requests win over auto-routing
    assert not tv._use_small(big, None, False, "f32", k=1, st="f32")
    assert not tv._use_small(big, True, None, "f32", k=1, st="f32")
    # resident=True forces the blocked schedule even off-TPU
    monkeypatch.setattr(tv.jax, "default_backend", lambda: "cpu")
    assert tv._use_small(big, None, True, "f32", k=1, st="f32")
    assert not tv._use_small(big, None, None, "f32", k=1, st="f32")


def test_trsv_f16_storage_public_api():
    """f16 storage through the public trsv/trsm (the driver's new
    Acc<f32,f16> column): errors at the f16 storage floor, sweep path
    (resident=False) agreeing with the blocked schedule. On hardware the
    sweep upcasts f16 outside the kernel (Mosaic has no f16 dialect type);
    interpret mode runs it natively — same semantics either way."""
    n = 640
    lu, b64 = _packed_lu(n, seed=11)
    ref = _ref_solve(lu, b64, "upper", False)
    a = jnp.asarray(lu, jnp.float16)
    b = jnp.asarray(b64, jnp.float16)
    got = trsvops.trsv(a, b, uplo="upper", unit=False)
    assert _rel(got, ref) < 6e-4
    got_sweep = trsvops.trsv(a, b, uplo="upper", unit=False, resident=False)
    assert _rel(got_sweep, ref) < 6e-4
    B = jnp.asarray(np.stack([b64, 3 * b64], 1), jnp.float16)
    gotm = trsvops.trsm(a, B, uplo="upper", unit=False)
    assert _rel(gotm[:, 0], ref) < 6e-4


def test_fixed_tier_bf16_envelope_warns():
    """The fixed trsv/trsm entry points share acc_trsv's stability warning:
    the recurrence amplification is a property of bf16 storage, not the tier."""
    n = 2048
    lu, b64 = _packed_lu(n, seed=80)
    ab = jnp.asarray(lu, jnp.float32).astype(jnp.bfloat16)
    b = jnp.asarray(b64, jnp.float32)
    with pytest.warns(UserWarning, match="bf16-storage"):
        trsvops.trsv(ab, b, unit=False)
    with pytest.warns(UserWarning, match="bf16-storage"):
        trsvops.trsm(ab, b.reshape(n, 1), unit=False)
    import warnings as w

    with w.catch_warnings():
        w.simplefilter("error")
        trsvops.trsv(ab, b, unit=False, unstable_ok=True)


def test_df64_resident_true_rejected():
    """There is no XLA-composed resident df64 mode; an explicit request must
    fail loudly rather than silently running the Pallas sweep."""
    n = 256
    lu, b64 = _packed_lu(n, seed=81)
    a = jnp.asarray(lu, jnp.float32)
    b = jnp.asarray(b64, jnp.float32)
    with pytest.raises(ValueError, match="resident=True unsupported"):
        trsvops.acc_trsv(a, b, unit=False, ar="df64", resident=True)
    with pytest.raises(ValueError, match="resident=True unsupported"):
        trsvops.acc_trsm(a, b.reshape(n, 1), unit=False, ar="df64", resident=True)


def test_trsv_blocked_refinement_matches_substitution_class():
    """The blocked-XLA route's diagonal-block application must be
    substitution-class accurate: inv-only application carried the inverse's
    forward error (~1.8x XLA's at the 24576 endpoint, round 3); one
    residual-correction step recovers it (round 4). Gate: the blocked route
    errs no worse than 1.25x XLA's monolithic TriangularSolve ON THE SAME
    BACKEND (XLA:CPU's sequential matmul accumulation is noisier than BLAS,
    so a scipy baseline would conflate backend noise with the algorithm —
    measured 1.07x here vs the pre-fix 1.7-2.4x)."""
    import jax

    n = 1024
    a64 = gen_mtx(MatrixInfo(n, n), seed=42)
    lu64, _ = scipy.linalg.lu_factor(a64)
    t64 = np.triu(lu64)
    b64 = gen_mtx(MatrixInfo(1, n), seed=43)[0]
    ref = scipy.linalg.solve_triangular(t64, b64, lower=False,
                                        unit_diagonal=False)
    a = jnp.asarray(lu64, jnp.float32)
    b = jnp.asarray(b64, jnp.float32)
    x_blk = jax.jit(
        lambda a, b: trsvops.trsv(a, b, "upper", False, resident=True)
    )(a, b)
    x_xla = jax.jit(
        lambda a, b: trsvops.xla_trsv(a, b, "upper", False)
    )(a, b)

    def relerr(x):
        return np.abs(np.asarray(x, np.float64) - ref).sum() / np.abs(ref).sum()

    assert relerr(x_blk) < 1.25 * relerr(x_xla), (relerr(x_blk), relerr(x_xla))


def test_leaf_vec_gate_sweep():
    """The single-rhs BLOCK_VEC schedule substitutes with LEAF_VEC-granular
    diagonal dots (probe_r4b: leaf 256 beats 64 by +3.6% f32 / +9.3% df64 at
    n=24576); TRSM and non-BLOCK_VEC blocks keep LEAF. Shrunk constants so
    the gate (k==1 and block==BLOCK_VEC -> LEAF_VEC) and the bigger-leaf
    numerics both run on CPU."""
    import accblas_tpu.ops.trsv as tv

    n = 1024
    lu, b64 = _packed_lu(n, seed=61)
    ref = _ref_solve(lu, b64, "upper", False)
    a = jnp.asarray(lu, jnp.float32)
    b = jnp.asarray(b64, jnp.float32)
    old = tv.BLOCK_VEC, tv.LEAF, tv.LEAF_VEC
    tv.BLOCK_VEC, tv.LEAF, tv.LEAF_VEC = 128, 16, 64
    try:
        # k==1 at n >= 8*BLOCK_VEC -> block=128, leaf=LEAF_VEC=64
        got = tv.trsv(a, b, unit=False, resident=False)
        assert _rel(got, ref) < 1e-4
        got_df = tv.acc_trsv(a, b, unit=False, ar="df64", resident=False)
        assert _rel(got_df, ref) < _rel(got, ref)
        # TRSM keeps LEAF: same triangle, 2 rhs columns
        B = jnp.stack([b, b * jnp.float32(2.0)], axis=1)
        X = tv.trsm(a, B, uplo="upper", unit=False)
        assert _rel(X[:, 0], ref) < 1e-4 and _rel(X[:, 1], 2 * ref) < 1e-4
    finally:
        tv.BLOCK_VEC, tv.LEAF, tv.LEAF_VEC = old


def test_narrow_block_retune_gate():
    """Round-5 blocked-route block retune (probe_r5m/r5n on v5e): narrow
    storage in the per-slice convert-feed regime (k < 32) takes
    BLOCK_VEC=1024 blocks (f8 969 -> 1128, bf16 692 -> 744 GF/s at 24576;
    wins at every probed n >= 4096, and probe_r5p pinned the crossover at
    the regime boundary itself — 1024 wins down to n=2176, so the gate is
    n > RESIDENT_N). f32, wide panels (k >= 32, upfront-cast TRSM), and
    VMEM-resident n keep _block_for. Gate values pinned here; numerics
    exercised below with shrunk constants so the BLOCK_VEC branch runs on
    CPU."""
    import accblas_tpu.ops.trsv as tv

    assert tv._small_block_for(24576, 1, False) == tv.BLOCK_VEC
    assert tv._small_block_for(4096, 1, False) == tv.BLOCK_VEC
    assert tv._small_block_for(4096, 31, False) == tv.BLOCK_VEC
    # probe_r5p: the whole per-slice regime (n > RESIDENT_N) takes 1024
    assert tv._small_block_for(2176, 1, False) == tv.BLOCK_VEC
    assert tv._small_block_for(tv.RESIDENT_N + 1, 1, False) == tv.BLOCK_VEC
    # f32 keeps the 512 schedule (error captures are 512-vintage)
    assert tv._small_block_for(24576, 1, True) == tv.BLOCK
    # wide panels are upfront-cast TRSM: BLOCK halves the rhs-group budget
    assert tv._small_block_for(24576, 32, False) == tv.BLOCK
    assert tv._small_block_for(24576, 128, False) == tv.BLOCK
    # at/below the regime boundary: unchanged
    assert tv._small_block_for(2048, 1, False) == tv.BLOCK
    assert tv._small_block_for(700, 1, False) == 256

    # numerics through the wide-block branch: shrink the gate so an
    # n=1024 bf16 solve (and a ragged n=1000 one) picks block=BLOCK_VEC=256
    n = 1024
    lu, b64 = _packed_lu(n, seed=62)
    old = tv.BLOCK_VEC, tv._NARROW_BLOCK_N
    tv.BLOCK_VEC, tv._NARROW_BLOCK_N = 256, 512
    try:
        for nn in (n, 1000):
            ref = _ref_solve(lu[:nn, :nn], b64[:nn], "upper", False)
            a = jnp.asarray(lu[:nn, :nn], jnp.bfloat16)
            b = jnp.asarray(b64[:nn], jnp.float32)
            got = tv._trsv_small(a, b, "upper", False, "f32")
            assert _rel(got, ref) < 1e-2, nn  # bf16 storage floor class
    finally:
        tv.BLOCK_VEC, tv._NARROW_BLOCK_N = old


@pytest.mark.parametrize("uplo", ["upper", "lower"])
@pytest.mark.parametrize("unit", [True, False])
def test_df_tri_inverse_correctly_rounded(uplo, unit):
    """_df_tri_inverse == fl32 of the exact (fp64) inverse of the stored
    block, up to round-to-nearest ties at the eps^2 boundary (<= a handful
    of elements). This is the rounding-class setup inverse whose inv-only
    application reaches below-substitution error (probe_r4f/r4g model)."""
    s, g = 192, 3
    rng = np.random.default_rng(11)
    stack32 = (rng.uniform(-1, 1, (g, s, s)) + np.eye(s) * (0.25 * s)).astype(np.float32)
    lower = uplo == "lower"
    got = np.asarray(
        trsvops._df_tri_inverse(jnp.asarray(stack32), lower, unit), np.float64
    )
    for gi in range(g):
        t = np.tril(stack32[gi]) if lower else np.triu(stack32[gi])
        if unit:
            np.fill_diagonal(t, 1.0)
        exact = scipy.linalg.solve_triangular(
            t.astype(np.float64), np.eye(s), lower=lower
        )
        rounded = exact.astype(np.float32).astype(np.float64)
        ndiff = int((got[gi] != rounded).sum())
        assert ndiff <= 8, (uplo, unit, gi, ndiff)
        # any tie-off elements still agree to ~1 ulp32 relative
        denom = np.abs(rounded) + 1e-300
        assert np.max(np.abs(got[gi] - rounded) / denom) < 3e-7, (uplo, unit)


def test_trsv_setup_df64_inverse_end_to_end():
    """Probe flag path: rounding-class setup inverses + refinement off
    lands at-or-below the shipped per-app-refined route's error."""
    n = 1024
    lu, b64 = _packed_lu(n, seed=23)
    ref = _ref_solve(lu, b64, "upper", False)
    a = jnp.asarray(lu, jnp.float32)
    b = jnp.asarray(b64, jnp.float32)
    base = _rel(trsvops.trsv(a, b, uplo="upper", unit=False, resident=True), ref)
    trsvops._PROBE_SETUP_DF64_INV = True
    try:
        got = _rel(trsvops.trsv(a, b, uplo="upper", unit=False, resident=True), ref)
    finally:
        trsvops._PROBE_SETUP_DF64_INV = False
    assert got < 5e-5 and got < base * 1.5, (got, base)


def test_refine_gate_scope():
    """Per-app diag-block refinement applies ONLY to f32 storage at
    n >= 512 (round 4, measured on v5e): at 128/256 the inv-apply solution
    already ties XLA TriangularSolve exactly and refining halved throughput
    (28.8 -> 16.0 GF/s at 128, trsv_flops.csv); on bf16/f16 storage the
    truncation error dominates what refinement fixes by 3+ orders while
    costing ~10% (690.6 -> 622.7 at 24576). Pin the gate: toggling the
    probe kill-switch must be a bit-for-bit no-op exactly where the gate
    says refinement is off, and must change bits where it says on."""

    def solve_both(a, b):
        got = np.asarray(trsvops._trsv_small(a, b, "upper", False, "f32"),
                         np.float64)
        trsvops._PROBE_DISABLE_REFINE = True
        try:
            raw = np.asarray(trsvops._trsv_small(a, b, "upper", False, "f32"),
                             np.float64)
        finally:
            trsvops._PROBE_DISABLE_REFINE = False
        return got, raw

    # f32 storage, n >= 512: refinement active (bits differ, both at floor)
    lu, b64 = _packed_lu(1024)
    ref = _ref_solve(lu, b64, "upper", False)
    got, raw = solve_both(jnp.asarray(lu, jnp.float32),
                          jnp.asarray(b64, jnp.float32))
    assert not np.array_equal(got, raw)
    assert _rel(got, ref) < 5e-6 and _rel(raw, ref) < 5e-6
    # f32 storage, n < 512: gate off -> kill-switch is a no-op
    lu, b64 = _packed_lu(256)
    got, raw = solve_both(jnp.asarray(lu, jnp.float32),
                          jnp.asarray(b64, jnp.float32))
    np.testing.assert_array_equal(got, raw)
    # narrow storage at large n: gate off -> kill-switch is a no-op
    lu, b64 = _packed_lu(1024)
    got, raw = solve_both(jnp.asarray(lu, jnp.bfloat16),
                          jnp.asarray(b64, jnp.bfloat16))
    np.testing.assert_array_equal(got, raw)


def test_acc_trsm_df64_wide_routing_gate():
    """Round-5 routing (probe_r5b): acc_trsm df64 with k >= 32 rides the
    blocked-XLA _trsm_small_df64 route; an explicit resident=False must
    still force the fused Pallas sweep (the probe escape hatch the advisor
    asked round 2 to preserve)."""
    import jax

    n, k = 768, 32
    lu, _ = _packed_lu(n, seed=59)
    b64 = gen_mtx(MatrixInfo(k, n), seed=61).T
    a = jnp.asarray(lu, jnp.float32)
    b = jnp.asarray(b64, jnp.float32)
    routed = jax.jit(lambda A, B: trsvops.acc_trsm(
        A, B, uplo="upper", unit=False, ar="df64"))(a, b)
    direct = jax.jit(lambda A, B: trsvops._trsm_small_df64(
        A, B, "upper", False, "f32"))(a, b)
    np.testing.assert_array_equal(np.asarray(routed), np.asarray(direct))
    swept = jax.jit(lambda A, B: trsvops.acc_trsm(
        A, B, uplo="upper", unit=False, ar="df64", resident=False))(a, b)
    assert not np.array_equal(np.asarray(swept), np.asarray(routed))
    # both land in the df64 error class against the fp64 oracle
    ref = _ref_solve_multi(lu, b64, "upper", False)

    def rel(x):
        return (np.linalg.norm(np.asarray(x, np.float64) - ref)
                / np.linalg.norm(ref))

    assert rel(routed) < 5e-6 and rel(swept) < 5e-6


@pytest.mark.parametrize("n", [768, 832])  # aligned (3x256) and ragged (+64)
def test_trsm_small_df64_beats_f32_blocked(n):
    """The blocked-XLA df64 TRSM (probe_r5b candidate: DF-carried panels on
    the `_trsv_small` schedule) must land strictly below the f32 blocked
    route's error on both aligned and ragged n — the DF carry exists to
    remove the f32 accumulation term, leaving only the f32-storage floor.
    Vector form must agree with column 0 of the panel solve exactly."""
    import jax

    lu, _ = _packed_lu(n, seed=91)
    b64 = gen_mtx(MatrixInfo(n, 16), seed=92)
    a = jnp.asarray(lu, jnp.float32)
    b = jnp.asarray(b64, jnp.float32)
    for uplo, unit in (("upper", False), ("lower", True)):
        t64 = np.triu(lu) if uplo == "upper" else np.tril(lu)
        if unit:
            np.fill_diagonal(t64, 1.0)
        ref = scipy.linalg.solve_triangular(
            t64, b64, lower=(uplo == "lower"), unit_diagonal=unit)
        x_df = jax.jit(lambda A, B: trsvops._trsm_small_df64(
            A, B, uplo, unit, "f32"))(a, b)
        x_f32 = jax.jit(lambda A, B: trsvops._trsv_small(
            A, B, uplo, unit, "f32"))(a, b)

        def rel(x):
            return (np.abs(np.asarray(x, np.float64) - ref).sum()
                    / np.abs(ref).sum())

        assert rel(x_df) < rel(x_f32), (uplo, unit, rel(x_df), rel(x_f32))
    # vector form rides the same schedule (k=1 GEMMs accumulate in a
    # different XLA order than k=16, so bitwise equality is not required —
    # the error class is)
    t64 = np.triu(lu)
    ref1 = scipy.linalg.solve_triangular(t64, b64[:, 0], lower=False,
                                         unit_diagonal=False)
    x_vec = jax.jit(lambda A, B: trsvops._trsm_small_df64(
        A, B, "upper", False, "f32"))(a, b[:, 0])
    x1_f32 = jax.jit(lambda A, B: trsvops._trsv_small(
        A, B, "upper", False, "f32"))(a, b[:, 0])
    e_vec = np.abs(np.asarray(x_vec, np.float64) - ref1).sum() / np.abs(ref1).sum()
    e_f32 = np.abs(np.asarray(x1_f32, np.float64) - ref1).sum() / np.abs(ref1).sum()
    assert x_vec.shape == (n,)
    # the single-vector solve on a diagonally-dominant factor already sits
    # AT the f32 storage floor (~1.9e-7 here), so df64 can only tie it
    assert e_vec < 1.1 * e_f32, (e_vec, e_f32)


@pytest.mark.parametrize("n", [1664, 2048])
def test_blocked_routes_block_override(n):
    """The probe-tunable `block=` parameter (round 5, probe_r5d) must not
    change the error class: block=1024 (vs _block_for's 512 default) lands
    in the same class as the default for BOTH the f32 blocked route
    (refined) and the DF-carried TRSM route. n=1664 exercises a ragged
    last block (1024 + 640) at the override size."""
    import jax

    lu, b64 = _packed_lu(n)
    a = jnp.asarray(lu, jnp.float32)
    b = jnp.asarray(b64, jnp.float32)
    ref = _ref_solve(lu, b64, "upper", False)
    d = jax.jit(lambda A, B: trsvops._trsv_small(A, B, "upper", False, "f32"))(a, b)
    o = jax.jit(lambda A, B: trsvops._trsv_small(
        A, B, "upper", False, "f32", block=1024))(a, b)
    # same error class: the override may not blow past the default route
    # (refinement holds the diag-inverse error at substitution class for
    # any block size; CPU probe_r5d model: 1024 keeps refined f32 at the
    # default's error while unrefined drifts 2.8e-5 -> 3.7e-5)
    assert _rel(o, ref) < 4 * max(_rel(d, ref), 1e-7), (_rel(o, ref), _rel(d, ref))

    B64 = np.stack([b64 * s for s in (1.0, -1.0, 0.5, 2.0)] * 8, 1)  # (n, 32)
    Bref = _ref_solve(lu, B64, "upper", False)
    B = jnp.asarray(B64, jnp.float32)
    dm = jax.jit(lambda A, X: trsvops._trsm_small_df64(A, X, "upper", False, "f32"))(a, B)
    om = jax.jit(lambda A, X: trsvops._trsm_small_df64(
        A, X, "upper", False, "f32", block=1024))(a, B)
    assert _rel(om, Bref) < 4 * max(_rel(dm, Bref), 1e-7), (_rel(om, Bref), _rel(dm, Bref))
