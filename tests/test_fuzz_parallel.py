"""Seeded configuration fuzz for the sharded (multi-chip) BLAS layer.

`tests/test_fuzz.py` walks the single-chip configuration space; this file
does the same for the `parallel` layer on the virtual 8-device CPU mesh —
random mesh-divisible shapes x storage x arithmetic tier vs the fp64 oracle,
so a seam between the local kernels and the shard_map combines (psum vs the
exact DF all_gather+fold, beta==0 vendor semantics, rhs-axis panel splits)
can't hide between the hand-picked cases in `tests/test_parallel.py`.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.linalg

from accblas_tpu.parallel import make_mesh, pdot, pgemv, ptrsm
from accblas_tpu.utils import MatrixInfo, gen_mtx

RNG = np.random.Generator(np.random.Philox(20260819))

# floors: (storage, ar) -> relative-error budget (1-norm), κ-free operands
FLOOR = {("f32", "f32"): 3e-5, ("bf16", "f32"): 3e-2,
         ("f32", "df64"): 3e-6, ("bf16", "df64"): 3e-2}

COLS = 4  # cols axis extent of the 2x4 mesh
ROWS = 2


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


def _mk(storage):
    return jnp.bfloat16 if storage == "bf16" else jnp.float32


PDOT_CASES = [
    (COLS * int(RNG.integers(40, 4000)), st, ar)
    for st in ("f32", "bf16") for ar in ("f32", "df64") for _ in range(2)
]


@pytest.mark.parametrize("n,st,ar", PDOT_CASES)
def test_fuzz_pdot(n, st, ar, mesh):
    x64 = gen_mtx(MatrixInfo(1, n), seed=n)[0]
    y64 = gen_mtx(MatrixInfo(1, n), seed=n + 1)[0]
    x = jnp.asarray(x64, jnp.float32).astype(_mk(st))
    y = jnp.asarray(y64, jnp.float32).astype(_mk(st))
    xs = np.asarray(x.astype(jnp.float32), np.float64)
    ys = np.asarray(y.astype(jnp.float32), np.float64)
    ref = xs @ ys
    out = pdot(x, y, mesh, axis="cols", ar=ar)
    got = float(out.hi) + float(out.lo) if ar == "df64" else float(out)
    scale = float(np.abs(xs * ys).sum())  # cancellation-free scale
    assert abs(got - ref) / scale < FLOOR[(st, ar)]


PGEMV_CASES = [
    (
        ROWS * int(RNG.integers(8, 300)),
        COLS * int(RNG.integers(16, 300)),
        st,
        ar,
        float(RNG.choice([0.0, 1.0, -0.5])),
    )
    for st in ("f32", "bf16") for ar in ("f32", "df64") for _ in range(2)
]


@pytest.mark.parametrize("m,n,st,ar,beta", PGEMV_CASES)
def test_fuzz_pgemv(m, n, st, ar, beta, mesh):
    a64 = gen_mtx(MatrixInfo(m, n), seed=m * 1000 + n)
    x64 = gen_mtx(MatrixInfo(1, n), seed=n)[0]
    r64 = gen_mtx(MatrixInfo(1, m), seed=m)[0]
    a = jnp.asarray(a64, jnp.float32).astype(_mk(st))
    x = jnp.asarray(x64, jnp.float32).astype(_mk(st))
    r = jnp.asarray(r64, jnp.float32)
    ref = 1.5 * (
        np.asarray(a.astype(jnp.float32), np.float64)
        @ np.asarray(x.astype(jnp.float32), np.float64)
    ) + beta * np.asarray(r, np.float64)
    got = np.asarray(
        pgemv(a, x, r, 1.5, beta, ar=ar, mesh=mesh).astype(jnp.float32),
        np.float64,
    )
    rel = np.linalg.norm(got - ref, 1) / np.linalg.norm(ref, 1)
    assert rel < FLOOR[(st, ar)], f"rel={rel:.2e} (m={m} n={n} {st} {ar} b={beta})"


PTRSM_CASES = [
    (
        int(RNG.integers(100, 700)),
        COLS * int(RNG.integers(1, 9)),
        RNG.choice(["upper", "lower"]),
        bool(RNG.integers(0, 2)),
        ar,
    )
    for ar in ("f32", "df64") for _ in range(3)
]


@pytest.mark.parametrize("n,k,uplo,unit,ar", PTRSM_CASES)
def test_fuzz_ptrsm(n, k, uplo, unit, ar, mesh):
    if unit:
        # unit solves never read the diagonal; |off-diag| ~ 1/n keeps the
        # substitution bounded (see tests/test_fuzz.py::test_fuzz_trsv)
        lu = gen_mtx(MatrixInfo(n, n), seed=n) / n
    else:
        a64 = gen_mtx(MatrixInfo(n, n), seed=n) + np.eye(n) * (0.25 * n)
        lu, _ = scipy.linalg.lu_factor(a64)
    t = np.tril(lu) if uplo == "lower" else np.triu(lu)
    if unit:
        np.fill_diagonal(t, 1.0)
    b64 = gen_mtx(MatrixInfo(k, n), seed=n + 7)
    ref = scipy.linalg.solve_triangular(
        t, b64.T, lower=(uplo == "lower"), unit_diagonal=False
    )
    a = jnp.asarray(lu, jnp.float32)
    b = jnp.asarray(b64.T, jnp.float32)
    got = np.asarray(ptrsm(a, b, uplo, unit, ar=ar, mesh=mesh), np.float64)
    rel = np.linalg.norm(got - ref, 1) / np.linalg.norm(ref, 1)
    assert rel < 3e-5, f"rel={rel:.2e} (n={n} k={k} {uplo} unit={unit} {ar})"


# --- uneven (non-mesh-divisible) shards: the parallel layer zero-pads
# exactly (parallel.blas._pad_to) and slices results back -------------------

PDOT_UNEVEN = [
    (COLS * int(RNG.integers(40, 2000)) + int(RNG.integers(1, COLS)), st, ar)
    for st in ("f32", "bf16") for ar in ("f32", "df64")
]


@pytest.mark.parametrize("n,st,ar", PDOT_UNEVEN)
def test_fuzz_pdot_uneven(n, st, ar, mesh):
    assert n % COLS != 0
    test_fuzz_pdot(n, st, ar, mesh)


PGEMV_UNEVEN = [
    (
        ROWS * int(RNG.integers(8, 200)) + 1,
        COLS * int(RNG.integers(16, 200)) + int(RNG.integers(1, COLS)),
        st,
        ar,
        float(RNG.choice([0.0, 1.0])),
    )
    for st in ("f32", "bf16") for ar in ("f32", "df64")
]


@pytest.mark.parametrize("m,n,st,ar,beta", PGEMV_UNEVEN)
def test_fuzz_pgemv_uneven(m, n, st, ar, beta, mesh):
    assert m % ROWS != 0 and n % COLS != 0
    test_fuzz_pgemv(m, n, st, ar, beta, mesh)


@pytest.mark.parametrize("k", [3, 7, 13])
def test_fuzz_ptrsm_uneven_rhs(k, mesh):
    assert k % COLS != 0
    test_fuzz_ptrsm(257, k, "upper", False, "f32", mesh)


# --- mesh-shape fuzz: every op on the degenerate / transposed meshes a
# real slice topology may force (1x8, 8x1, 4x2 — multi-chip readiness
# pack, round 5). Shapes are uneven on purpose so the _pad_to path is
# exercised per mesh extent too. --------------------------------------------


@pytest.mark.parametrize("shape", [(1, 8), (8, 1), (4, 2)])
def test_fuzz_mesh_shapes(shape):
    from accblas_tpu.models import solvers
    from accblas_tpu.parallel import pcg, ptrsv

    mesh2 = make_mesh(8, shape=shape)
    n = 8 * 37 + 3  # uneven vs every extent

    # pdot df64: exact DF combine over the cols axis at this extent
    x64 = gen_mtx(MatrixInfo(1, n), seed=shape[0] * 100 + n)[0]
    y64 = gen_mtx(MatrixInfo(1, n), seed=shape[0] * 100 + n + 1)[0]
    x = jnp.asarray(x64, jnp.float32)
    y = jnp.asarray(y64, jnp.float32)
    ref = np.asarray(x, np.float64) @ np.asarray(y, np.float64)
    out = pdot(x, y, mesh2, axis="cols", ar="df64")
    scale = float(np.abs(np.asarray(x, np.float64) * np.asarray(y, np.float64)).sum())
    assert abs(float(out.hi) + float(out.lo) - ref) / scale < 3e-6

    # pgemv df64 (rows x cols sharded, beta=1)
    m = 8 * 23 + 5
    a64 = gen_mtx(MatrixInfo(m, n), seed=m + n)
    r64 = gen_mtx(MatrixInfo(1, m), seed=m)[0]
    a = jnp.asarray(a64, jnp.float32)
    r = jnp.asarray(r64, jnp.float32)
    gref = np.asarray(a, np.float64) @ np.asarray(x, np.float64) + np.asarray(
        r, np.float64
    )
    got = np.asarray(pgemv(a, x, r, 1.0, 1.0, ar="df64", mesh=mesh2), np.float64)
    assert np.linalg.norm(got - gref, 1) / np.linalg.norm(gref, 1) < 3e-6

    # ptrsv row-sharded over this mesh's rows extent
    a64t = gen_mtx(MatrixInfo(m, m), seed=m) + np.eye(m) * (0.25 * m)
    lu, _ = scipy.linalg.lu_factor(a64t)
    t = np.triu(lu)
    b64 = gen_mtx(MatrixInfo(1, m), seed=m + 7)[0]
    tref = scipy.linalg.solve_triangular(t, b64, lower=False)
    xv = np.asarray(
        ptrsv(jnp.asarray(lu, jnp.float32), jnp.asarray(b64, jnp.float32),
              "upper", False, ar="f32", mesh=mesh2),
        np.float64,
    )
    assert np.linalg.norm(xv - tref, 1) / np.linalg.norm(tref, 1) < 3e-5

    # pcg on bf16 AND f32 storage: the sharded recurrence must track the
    # single-chip cg per tier on every mesh shape
    ns = 8 * 16
    s64 = gen_mtx(MatrixInfo(ns, ns), seed=ns)
    spd64 = s64 @ s64.T / ns + np.eye(ns) * 0.5
    bs = jnp.asarray(gen_mtx(MatrixInfo(1, ns), seed=ns + 1)[0], jnp.float32)
    for st_dtype, ar in ((jnp.float32, "df64"), (jnp.bfloat16, "f32")):
        a_spd = jnp.asarray(spd64, jnp.float32).astype(st_dtype)
        xp, rsp, itp = pcg(a_spd, bs, mesh=mesh2, iters=40, ar=ar, tol=0.0)
        xs_, rss, its = solvers.cg(a_spd, bs, iters=40, ar=ar, tol=0.0)
        rp = float(rsp)
        rs = float(rss)
        assert np.isfinite(rp) and np.isfinite(rs)
        # same convergence class (not bitwise): residuals within 10x
        assert rp <= rs * 10 + 1e-12 and rs <= rp * 10 + 1e-12, (
            f"shape={shape} {st_dtype}/{ar}: pcg {rp:.3e} vs cg {rs:.3e}"
        )


# --- row-sharded TRSV ------------------------------------------------------

from accblas_tpu.parallel import ptrsv  # noqa: E402

PTRSV_CASES = [
    (int(RNG.integers(100, 700)), RNG.choice(["upper", "lower"]),
     bool(RNG.integers(0, 2)), ar)
    for ar in ("f32", "df64") for _ in range(3)
]


@pytest.mark.parametrize("n,uplo,unit,ar", PTRSV_CASES)
def test_fuzz_ptrsv(n, uplo, unit, ar, mesh):
    """Row-sharded single-rhs solve vs the scipy fp64 oracle — block-row
    substitution over the mesh rows axis, including uneven n (identity-tail
    padding). Same conditioning recipe as test_fuzz_ptrsm."""
    if unit:
        lu = gen_mtx(MatrixInfo(n, n), seed=n) / n
    else:
        a64 = gen_mtx(MatrixInfo(n, n), seed=n) + np.eye(n) * (0.25 * n)
        lu, _ = scipy.linalg.lu_factor(a64)
    t = np.tril(lu) if uplo == "lower" else np.triu(lu)
    if unit:
        np.fill_diagonal(t, 1.0)
    b64 = gen_mtx(MatrixInfo(1, n), seed=n + 7)[0]
    ref = scipy.linalg.solve_triangular(
        t, b64, lower=(uplo == "lower"), unit_diagonal=False
    )
    a = jnp.asarray(lu, jnp.float32)
    b = jnp.asarray(b64, jnp.float32)
    got = np.asarray(ptrsv(a, b, uplo, unit, ar=ar, mesh=mesh), np.float64)
    rel = np.linalg.norm(got - ref, 1) / np.linalg.norm(ref, 1)
    assert rel < 3e-5, f"rel={rel:.2e} (n={n} {uplo} unit={unit} {ar})"
