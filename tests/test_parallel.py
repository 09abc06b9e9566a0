"""Sharded BLAS on the virtual 8-device CPU mesh: pdot / pgemv / power_step
and the driver entry points."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from accblas_tpu.parallel import make_mesh, pdot, pgemv, power_step
from accblas_tpu.utils import MatrixInfo, gen_mtx


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


def test_mesh_shape(mesh):
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("rows", "cols")


def test_pdot_matches_local(mesh):
    n = 8 * 1024
    x64 = gen_mtx(MatrixInfo(1, n), seed=42)[0]
    y64 = gen_mtx(MatrixInfo(1, n), seed=43)[0]
    x = jnp.asarray(x64, jnp.float32)
    y = jnp.asarray(y64, jnp.float32)
    got = float(pdot(x, y, mesh, axis="cols", ar="f32"))
    ref = x64 @ y64
    assert abs(got - ref) / abs(ref) < 1e-5


def test_pdot_df64_exact_combine(mesh):
    """Cross-chip df64 combine must preserve the double-float width.

    Cancellation-heavy input: each cols-shard's partial is ~±64 while the
    total is ~0.3, so a component-wise psum of the DF pytree (hi and lo
    summed independently in f32) loses the hi-sum rounding (~64·2^-24 ≈
    4e-6 absolute → ~1e-5 relative) — the round-2 bug. The exact
    all_gather + df_add combine must match the host fp64 oracle to <1e-12."""
    n = 8192
    shards = 4  # cols axis of the 2x4 mesh
    rng = np.random.default_rng(7)
    base = np.repeat([1.0, -1.0, 1.0, -1.0], n // shards) / 32.0  # partials ±64
    noise = rng.uniform(-1.0, 1.0, n) * 1e-2
    x64 = base + noise
    y64 = np.ones(n)
    ref = float(x64 @ y64)  # ~ sum(noise) ~ O(0.3)
    assert abs(ref) < 5.0 and abs(ref) > 1e-3  # the construction held
    x = jnp.asarray(x64, jnp.float32)
    # f32 storage rounding of x is part of both sides of the comparison:
    # oracle on the stored values
    ref_stored = float(np.asarray(x, np.float64) @ y64)
    y = jnp.asarray(y64, jnp.float32)
    got = pdot(x, y, mesh, axis="cols", ar="df64", precise=True)
    from accblas_tpu.ops.df64 import DF, df_to_f64

    assert isinstance(got, DF)
    rel = abs(float(df_to_f64(got)) - ref_stored) / abs(ref_stored)
    assert rel < 1e-12, rel


def test_pgemv_df64_exact_combine(mesh):
    """pgemv's df64 tier must keep DF width across the cols-axis combine:
    per-shard row partials ~±64 cancel to O(0.1) totals, so rounding each
    partial to f32 before combining (the old psum form) would leave ~1e-5
    relative error; the DF all_gather + df_add fold must stay ~1e-7 of the
    PARTIAL magnitude, i.e. <1e-4 of the cancelled total — and the df64
    column must beat the plain-f32-arith pgemv by a wide margin."""
    m, n = 64, 8192
    shards = 4
    rng = np.random.default_rng(11)
    base = np.repeat([1.0, -1.0, 1.0, -1.0], n // shards)[None, :] / 32.0
    noise = rng.uniform(-1.0, 1.0, (m, n)) * 1e-3
    a64 = base + noise
    a = jnp.asarray(a64, jnp.float32)
    x = jnp.ones((n,), jnp.float32)
    r = jnp.zeros((m,), jnp.float32)
    ref = np.asarray(a, np.float64) @ np.ones(n)  # oracle on stored values
    got = np.asarray(pgemv(a, x, r, 1.0, 0.0, ar="df64", mesh=mesh), np.float64)
    rel = np.linalg.norm(got - ref, 1) / np.linalg.norm(ref, 1)
    # DF-exact combine: error ~ f32 product floor of the partials
    assert rel < 2e-4, rel
    got32 = np.asarray(pgemv(a, x, r, 1.0, 0.0, ar="f32", mesh=mesh), np.float64)
    rel32 = np.linalg.norm(got32 - ref, 1) / np.linalg.norm(ref, 1)
    assert rel < rel32 / 5, (rel, rel32)


def test_pgemv_matches_local(mesh):
    m, n = 512, 1024
    a64 = gen_mtx(MatrixInfo(m, n), seed=1)
    x64 = gen_mtx(MatrixInfo(1, n), seed=2)[0]
    r64 = gen_mtx(MatrixInfo(1, m), seed=3)[0]
    a = jnp.asarray(a64, jnp.float32)
    x = jnp.asarray(x64, jnp.float32)
    r = jnp.asarray(r64, jnp.float32)
    got = pgemv(a, x, r, 1.5, -0.5, ar="f32", mesh=mesh)
    ref = 1.5 * a64 @ x64 - 0.5 * r64
    rel = np.linalg.norm(np.asarray(got, np.float64) - ref, 1) / np.linalg.norm(ref, 1)
    assert rel < 1e-5


def test_power_step_jits_and_runs(mesh):
    m, n = 512, 1024
    a = jnp.asarray(gen_mtx(MatrixInfo(m, n), seed=5), jnp.float32).astype(jnp.bfloat16)
    x = jnp.asarray(gen_mtx(MatrixInfo(1, n), seed=6)[0], jnp.float32).astype(jnp.bfloat16)
    r = jnp.asarray(gen_mtx(MatrixInfo(1, m), seed=7)[0], jnp.float32)
    from jax.sharding import NamedSharding, PartitionSpec as P

    a = jax.device_put(a, NamedSharding(mesh, P("rows", "cols")))
    x = jax.device_put(x, NamedSharding(mesh, P("cols")))
    r = jax.device_put(r, NamedSharding(mesh, P("rows")))
    step = jax.jit(lambda a, x, r: power_step(a, x, r, mesh=mesh, ar="f32"))
    x_next, nu = step(a, x, r)
    jax.block_until_ready((x_next, nu))
    assert np.isfinite(float(nu)) and float(nu) > 0
    assert x_next.shape == (m,)


def test_graft_entry_single_chip():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out.shape == (args[2].shape[0],)
    assert np.all(np.isfinite(np.asarray(out, np.float32)))


def test_graft_entry_multichip():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_ptrsm_matches_local(mesh):
    """rhs-sharded TRSM: each chip solves its rhs panel, zero collectives."""
    import scipy.linalg

    from accblas_tpu.parallel import ptrsm

    n, k = 256, 32
    a64 = gen_mtx(MatrixInfo(n, n), seed=11)
    lu64, _ = scipy.linalg.lu_factor(a64)
    b64 = gen_mtx(MatrixInfo(n, k), seed=12)
    t = np.triu(lu64)
    ref = scipy.linalg.solve_triangular(t, b64, lower=False)
    a = jnp.asarray(lu64, jnp.float32)
    b = jnp.asarray(b64, jnp.float32)
    got = np.asarray(
        ptrsm(a, b, uplo="upper", unit=False, ar="f32", mesh=mesh), np.float64
    )
    assert got.shape == (n, k)
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-4


def test_pcg_matches_direct(mesh):
    """Mesh-sharded CG on an SPD system converges to the direct solution,
    with A (rows, cols)-sharded and every Krylov dot/matvec distributed."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from accblas_tpu.parallel import pcg

    n = 512
    m64 = gen_mtx(MatrixInfo(n, n), seed=21)
    a64 = m64 @ m64.T / n + np.eye(n) * 2.0  # SPD, modest condition number
    b64 = gen_mtx(MatrixInfo(1, n), seed=22)[0]
    ref = np.linalg.solve(a64, b64)

    a = jax.device_put(
        jnp.asarray(a64, jnp.float32), NamedSharding(mesh, P("rows", "cols"))
    )
    b = jax.device_put(jnp.asarray(b64, jnp.float32), NamedSharding(mesh, P("cols")))
    x, rs, it = jax.jit(
        lambda a, b: pcg(a, b, mesh=mesh, iters=200, tol=1e-7)
    )(a, b)
    x = np.asarray(x, np.float64)
    rel = np.linalg.norm(x - ref) / np.linalg.norm(ref)
    assert rel < 1e-4, rel
    assert int(it) <= 200


def test_pcg_df64_dots(mesh):
    """The df64 tier runs the Krylov dots through the exact cross-chip DF
    combine and still converges (same solution, wider coefficients)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from accblas_tpu.parallel import pcg

    n = 256
    m64 = gen_mtx(MatrixInfo(n, n), seed=23)
    a64 = m64 @ m64.T / n + np.eye(n) * 2.0
    b64 = gen_mtx(MatrixInfo(1, n), seed=24)[0]
    ref = np.linalg.solve(a64, b64)

    a = jax.device_put(
        jnp.asarray(a64, jnp.float32), NamedSharding(mesh, P("rows", "cols"))
    )
    b = jax.device_put(jnp.asarray(b64, jnp.float32), NamedSharding(mesh, P("cols")))
    x, rs, it = jax.jit(
        lambda a, b: pcg(a, b, mesh=mesh, iters=150, ar="df64", tol=1e-7)
    )(a, b)
    x = np.asarray(x, np.float64)
    rel = np.linalg.norm(x - ref) / np.linalg.norm(ref)
    assert rel < 1e-4, rel


def test_pgemv_beta0_ignores_uninitialized_res(mesh):
    """beta == 0 must not read res (vendor semantics the kernels enforce):
    a NaN-filled res buffer must not poison the output, in either tier."""
    m, n = 256, 512
    a64 = gen_mtx(MatrixInfo(m, n), seed=50)
    x64 = gen_mtx(MatrixInfo(1, n), seed=51)[0]
    a = jnp.asarray(a64, jnp.float32)
    x = jnp.asarray(x64, jnp.float32)
    res_nan = jnp.full((m,), np.nan, jnp.float32)
    ref = a64.astype(np.float64) @ x64.astype(np.float64)
    for ar in ("f32", "df64"):
        out = np.asarray(pgemv(a, x, res_nan, 1.0, 0.0, ar=ar, mesh=mesh))
        assert np.isfinite(out).all(), ar
        rel = np.abs(out - ref).sum() / np.abs(ref).sum()
        assert rel < 1e-5, (ar, rel)


def test_pgemv_traced_alpha_beta(mesh):
    """alpha/beta must stay runtime values under jit in every tier (the df64
    branch used to concretize with np.float32(tracer))."""
    m, n = 128, 256
    a = jnp.asarray(gen_mtx(MatrixInfo(m, n), seed=52), jnp.float32)
    x = jnp.asarray(gen_mtx(MatrixInfo(1, n), seed=53)[0], jnp.float32)
    r = jnp.ones((m,), jnp.float32)

    for ar in ("f32", "df64"):
        f = jax.jit(lambda al, be: pgemv(a, x, r, al, be, ar=ar, mesh=mesh))
        got = np.asarray(f(jnp.float32(2.0), jnp.float32(0.5)))
        ref = 2.0 * (np.asarray(a, np.float64) @ np.asarray(x, np.float64)) + 0.5
        rel = np.abs(got - ref).sum() / np.abs(ref).sum()
        assert rel < 1e-5, (ar, rel)


def test_pcg_custom_axis_names():
    """pcg must honor non-default mesh axis names like its siblings."""
    from accblas_tpu.parallel import pcg

    mesh2 = make_mesh(8, axes=("r", "c"))
    n = 1024
    rng = np.random.default_rng(9)
    m0 = rng.uniform(-1, 1, (n, n)).astype(np.float32)
    a_sys = (m0 @ m0.T / n + np.eye(n, dtype=np.float32) * 2.0).astype(np.float32)
    b = rng.uniform(-1, 1, n).astype(np.float32)
    x, rs, it = jax.jit(
        lambda a_, b_: pcg(a_, b_, mesh=mesh2, iters=40, tol=1e-8,
                           row_axis="r", col_axis="c")
    )(jnp.asarray(a_sys), jnp.asarray(b))
    resid = np.linalg.norm(a_sys.astype(np.float64) @ np.asarray(x, np.float64) - b)
    assert resid / np.linalg.norm(b) < 1e-4, (resid, int(it))
