"""Seeded configuration fuzz: randomized (shape, tier, mode) sweeps.

The per-feature tests pin each path at hand-picked shapes; this sweep walks a
seeded random sample of the full configuration space (ragged/aligned sizes x
uplo x unit x storage x nrhs x arithmetic tier) against the fp64 oracle, so a
routing seam between two paths (resident/streaming, padded/zero-copy,
leaf/block boundaries) can't hide between the hand-picked points. Mirrors the
reference's evaluation contract: every variant agrees with the fp64 reference
to its tier's error floor (SURVEY.md §4), at ARBITRARY sizes — the reference's
step-100 grids exercise exactly this (``cuda/gemv_benchmark.cu:30``).
"""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.linalg

from accblas_tpu.ops import dot as dotops
from accblas_tpu.ops import gemv as gemvops
from accblas_tpu.ops import trsv as trsvops
from accblas_tpu.utils import MatrixInfo, gen_mtx

RNG = np.random.Generator(np.random.Philox(20260818))

# floors: (storage, ar) -> relative-error budget (1-norm), κ-free operands
FLOOR = {("f32", "f32"): 3e-5, ("bf16", "f32"): 3e-2,
         ("f32", "df64"): 3e-6, ("bf16", "df64"): 3e-2}


def _mk(storage):
    return jnp.bfloat16 if storage == "bf16" else jnp.float32


DOT_CASES = [
    (int(RNG.integers(129, 70_000)), st, ar)
    for st in ("f32", "bf16") for ar in ("f32", "df64") for _ in range(3)
]


@pytest.mark.parametrize("n,st,ar", DOT_CASES)
def test_fuzz_dot(n, st, ar):
    x64 = gen_mtx(MatrixInfo(1, n), seed=n)[0]
    y64 = gen_mtx(MatrixInfo(1, n), seed=n + 1)[0]
    x = jnp.asarray(x64, jnp.float32).astype(_mk(st))
    y = jnp.asarray(y64, jnp.float32).astype(_mk(st))
    ref = np.asarray(x.astype(jnp.float32), np.float64) @ np.asarray(
        y.astype(jnp.float32), np.float64
    )
    out = dotops.acc_dot(x, y, ar=ar)
    got = float(out.hi) + float(out.lo) if ar == "df64" else float(out)
    # relative to sum|xy| (cancellation-free scale): random +-1 dots can land
    # near zero, which would turn a floor-level absolute error into a huge
    # relative one
    scale = float(np.abs(np.asarray(x.astype(jnp.float32), np.float64)
                         * np.asarray(y.astype(jnp.float32), np.float64)).sum())
    assert abs(got - ref) / scale < FLOOR[(st, ar)]


GEMV_CASES = [
    (int(RNG.integers(8, 900)), int(RNG.integers(9, 900)), st, ar)
    for st in ("f32", "bf16") for ar in ("f32", "df64") for _ in range(3)
]


@pytest.mark.parametrize("m,n,st,ar", GEMV_CASES)
def test_fuzz_gemv(m, n, st, ar):
    a64 = gen_mtx(MatrixInfo(m, n), seed=m * 1000 + n)
    x64 = gen_mtx(MatrixInfo(1, n), seed=n)[0]
    r64 = gen_mtx(MatrixInfo(1, m), seed=m)[0]
    a = jnp.asarray(a64, jnp.float32).astype(_mk(st))
    x = jnp.asarray(x64, jnp.float32).astype(_mk(st))
    r = jnp.asarray(r64, jnp.float32)
    ref = (
        np.asarray(a.astype(jnp.float32), np.float64)
        @ np.asarray(x.astype(jnp.float32), np.float64)
        + np.asarray(r, np.float64)
    )
    got = np.asarray(
        gemvops.acc_gemv(a, x, r, 1.0, 1.0, ar=ar).astype(jnp.float32), np.float64
    )
    rel = np.linalg.norm(got - ref, 1) / np.linalg.norm(ref, 1)
    assert rel < FLOOR[(st, ar)], f"rel={rel:.2e}"


TRSV_CASES = [
    (
        int(RNG.integers(64, 1200)),
        RNG.choice(["upper", "lower"]),
        bool(RNG.integers(0, 2)),
        int(RNG.choice([0, 0, 1, 5])),  # 0 = TRSV, else TRSM nrhs
        ar,
    )
    for ar in ("f32", "df64") for _ in range(6)
]


@pytest.mark.parametrize("n,uplo,unit,nrhs,ar", TRSV_CASES)
def test_fuzz_trsv(n, uplo, unit, nrhs, ar):
    if unit:
        # unit solves never read the diagonal; |off-diag| ~ 1/n keeps the
        # substitution recurrence bounded (a unit LU-factor triangle is
        # exponentially ill-conditioned — κ ~ 1e46 at n=768, NaN in ANY
        # precision; bench.py and __graft_entry__ use the same recipe)
        lu = gen_mtx(MatrixInfo(n, n), seed=n) / n
    else:
        a64 = gen_mtx(MatrixInfo(n, n), seed=n) + np.eye(n) * (0.25 * n)
        lu, _ = scipy.linalg.lu_factor(a64)
    t = np.tril(lu) if uplo == "lower" else np.triu(lu)
    if unit:
        np.fill_diagonal(t, 1.0)
    k = max(nrhs, 1)
    b64 = gen_mtx(MatrixInfo(k, n), seed=n + 7)
    ref = scipy.linalg.solve_triangular(
        t, b64.T, lower=(uplo == "lower"), unit_diagonal=False
    )
    a = jnp.asarray(lu, jnp.float32)
    if nrhs == 0:
        b = jnp.asarray(b64[0], jnp.float32)
        got = (
            trsvops.trsv(a, b, uplo, unit)
            if ar == "f32"
            else trsvops.acc_trsv(a, b, uplo, unit, ar="df64")
        )
        got = np.asarray(got, np.float64)
        refv = ref[:, 0]
    else:
        b = jnp.asarray(b64.T, jnp.float32)
        got = (
            trsvops.trsm(a, b, uplo, unit)
            if ar == "f32"
            else trsvops.acc_trsm(a, b, uplo, unit, ar="df64")
        )
        got = np.asarray(got, np.float64)
        refv = ref
    rel = np.linalg.norm(got - refv, 1) / np.linalg.norm(refv, 1)
    assert rel < 3e-5, f"rel={rel:.2e} (n={n} {uplo} unit={unit} nrhs={nrhs})"


NARROW_CASES = [
    (int(RNG.integers(40, 5000)), st)
    for st in ("f16", "f8e4m3") for _ in range(3)
]


@pytest.mark.parametrize("n,st", NARROW_CASES)
def test_fuzz_dot_narrow(n, st):
    dt = jnp.float16 if st == "f16" else jnp.float8_e4m3fn
    x64 = gen_mtx(MatrixInfo(1, n), seed=n + 3)[0]
    y64 = gen_mtx(MatrixInfo(1, n), seed=n + 4)[0]
    x = jnp.asarray(x64, jnp.float32).astype(dt)
    y = jnp.asarray(y64, jnp.float32).astype(dt)
    ref = np.asarray(x.astype(jnp.float32), np.float64) @ np.asarray(
        y.astype(jnp.float32), np.float64
    )
    got = float(dotops.acc_dot(x, y, ar="f32"))
    scale = float(np.abs(np.asarray(x.astype(jnp.float32), np.float64)
                         * np.asarray(y.astype(jnp.float32), np.float64)).sum())
    # ref is computed on the SAME stored values, so agreement is at the f32
    # accumulation floor, not the storage floor — keep a loose margin for the
    # pairwise-tree vs np.dot ordering difference
    assert abs(got - ref) / scale < 1e-4


GEMV_NARROW_CASES = [
    (int(RNG.integers(4, 700)), int(RNG.integers(9, 700)), st)
    for st in ("f16", "f8e4m3") for _ in range(3)
]


@pytest.mark.parametrize("m,n,st", GEMV_NARROW_CASES)
def test_fuzz_gemv_narrow(m, n, st):
    dt = jnp.float16 if st == "f16" else jnp.float8_e4m3fn
    a64 = gen_mtx(MatrixInfo(m, n), seed=m * 991 + n)
    x64 = gen_mtx(MatrixInfo(1, n), seed=n + 5)[0]
    r64 = gen_mtx(MatrixInfo(1, m), seed=m + 6)[0]
    a = jnp.asarray(a64, jnp.float32).astype(dt)
    x = jnp.asarray(x64, jnp.float32).astype(dt)
    r = jnp.asarray(r64, jnp.float32)
    ref = (
        np.asarray(a.astype(jnp.float32), np.float64)
        @ np.asarray(x.astype(jnp.float32), np.float64)
        + np.asarray(r, np.float64)
    )
    got = np.asarray(
        gemvops.acc_gemv(a, x, r, 1.0, 1.0, ar="f32").astype(jnp.float32),
        np.float64,
    )
    rel = np.linalg.norm(got - ref, 1) / np.linalg.norm(ref, 1)
    assert rel < 1e-4, f"rel={rel:.2e} (m={m} n={n} {st})"
