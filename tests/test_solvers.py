"""Application-tier solvers built on accessor kernels (CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp

from accblas_tpu.models import cg, power_method, richardson_refine
from accblas_tpu.utils import MatrixInfo, gen_mtx


def _spd(n, seed=42):
    m = gen_mtx(MatrixInfo(n, n), seed=seed)
    a = m @ m.T / n + np.eye(n) * 2.0
    return a


def test_cg_converges_f32():
    n = 256
    a64 = _spd(n)
    b64 = gen_mtx(MatrixInfo(1, n), seed=7)[0]
    a = jnp.asarray(a64, jnp.float32)
    b = jnp.asarray(b64, jnp.float32)
    x, rs, it = cg(a, b, iters=200, tol=1e-6)
    ref = np.linalg.solve(a64, b64)
    rel = np.linalg.norm(np.asarray(x, np.float64) - ref) / np.linalg.norm(ref)
    assert rel < 1e-4
    assert int(it) < 200  # tol fired


def test_cg_bf16_storage_df64_dots():
    n = 256
    a64 = _spd(n, seed=3)
    b64 = gen_mtx(MatrixInfo(1, n), seed=9)[0]
    ab = jnp.asarray(a64, jnp.float32).astype(jnp.bfloat16)
    b = jnp.asarray(b64, jnp.float32)
    x, rs, it = cg(ab, b, iters=100, ar="df64")
    # solves the bf16-rounded system
    a_st = np.asarray(ab.astype(jnp.float32), np.float64)
    ref = np.linalg.solve(a_st, b64)
    rel = np.linalg.norm(np.asarray(x, np.float64) - ref) / np.linalg.norm(ref)
    assert rel < 5e-2


def test_richardson_refine_reduces_residual():
    n = 256
    a64 = gen_mtx(MatrixInfo(n, n), seed=5) * 0.5 / n + np.eye(n)
    b64 = gen_mtx(MatrixInfo(1, n), seed=11)[0]
    a32 = jnp.asarray(a64, jnp.float32)
    x, rhist = richardson_refine(a32.astype(jnp.bfloat16), a32, jnp.asarray(b64, jnp.float32), iters=8)
    r = np.asarray(rhist, np.float64)
    assert r[-1] < r[0] * 1e-3


def test_power_method():
    n = 128
    a64 = _spd(n, seed=13)
    lam_ref = np.linalg.eigvalsh(a64)[-1]
    a = jnp.asarray(a64, jnp.float32)
    _, lam = power_method(a, iters=100)
    assert abs(float(lam) - lam_ref) / lam_ref < 1e-2


def test_cg_jits():
    n = 128
    a = jnp.asarray(_spd(n, seed=17), jnp.float32)
    b = jnp.ones((n,), jnp.float32)
    f = jax.jit(lambda a, b: cg(a, b, iters=20)[0])
    out = f(a, b)
    assert np.all(np.isfinite(np.asarray(out)))


def test_richardson_refine_streams_a_lo():
    # the preconditioner matvec must actually run through a_lo: perturbing
    # a_lo changes the iterate trajectory
    n = 128
    a64 = gen_mtx(MatrixInfo(n, n), seed=19) * 0.5 / n + np.eye(n)
    b64 = gen_mtx(MatrixInfo(1, n), seed=23)[0]
    a32 = jnp.asarray(a64, jnp.float32)
    b = jnp.asarray(b64, jnp.float32)
    x_good, _ = richardson_refine(a32.astype(jnp.bfloat16), a32, b, iters=4)
    x_pert, _ = richardson_refine(
        (a32 * 1.5).astype(jnp.bfloat16), a32, b, iters=4
    )
    assert not np.allclose(np.asarray(x_good), np.asarray(x_pert))


def test_richardson_refine_beats_plain_richardson():
    # the two-term Neumann step through a_lo contracts faster than a plain
    # Richardson update (a_lo = 0 degenerates to x += 2*omega*r)
    n = 128
    a64 = gen_mtx(MatrixInfo(n, n), seed=29) * 0.5 / n + np.eye(n)
    b64 = gen_mtx(MatrixInfo(1, n), seed=31)[0]
    a32 = jnp.asarray(a64, jnp.float32)
    b = jnp.asarray(b64, jnp.float32)
    _, r_mixed = richardson_refine(a32.astype(jnp.bfloat16), a32, b, iters=6, omega=1.0)
    _, r_plain = richardson_refine(jnp.zeros_like(a32), a32, b, iters=6, omega=0.5)  # plain x += r
    assert float(r_mixed[-1]) < float(r_plain[-1])


def test_cg_breakdown_surfaces_nan():
    """A non-SPD operator (den < 0 in the CG recurrence) must surface as
    NaN rs — distinguishable from genuine convergence — and exit early,
    not silently stall with the current iterate (ADVICE r3)."""
    n = 64
    a64 = -_spd(n)  # negative definite: first den = p^T A p < 0
    b64 = gen_mtx(MatrixInfo(1, n), seed=9)[0]
    a = jnp.asarray(a64, jnp.float32)
    b = jnp.asarray(b64, jnp.float32)
    x, rs, it = cg(a, b, iters=50, tol=0.0)
    assert np.isnan(float(rs))
    assert int(it) < 50  # breakdown exits the fixed budget early


def test_cg_fixed_budget_stays_inert_after_convergence():
    """den == 0 / rs == 0 (subnormal-flush convergence) keeps the guarded
    inert path: full fixed budget runs, result finite and converged."""
    n = 64
    a64 = _spd(n)
    b64 = gen_mtx(MatrixInfo(1, n), seed=9)[0]
    a = jnp.asarray(a64, jnp.float32)
    b = jnp.asarray(b64, jnp.float32)
    x, rs, it = cg(a, b, iters=300, tol=0.0)
    assert int(it) == 300
    assert np.isfinite(float(rs))
    ref = np.linalg.solve(a64, b64)
    rel = np.linalg.norm(np.asarray(x, np.float64) - ref) / np.linalg.norm(ref)
    assert rel < 1e-4
