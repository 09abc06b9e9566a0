"""Mixed-precision iterative solvers — the application tier.

The reference is a kernel showcase; its "application" is the benchmark
drivers. This module is the end-to-end demonstration of what the accessor
buys: Krylov/stationary solvers whose *storage* is cheap (bf16/f32 operands
stream at storage bandwidth) while the *arithmetic* that controls convergence
(dot products, residual accumulation) runs wider (f32 MXU accumulate or df64).
This is the classic mixed-precision-solver use case the accessor paper/Ginkgo
target (the repo under rebuild is Ginkgo's accessor demonstrator).

Everything is jit-compatible: loops are `lax.while_loop` / `lax.scan`, shapes
static, kernels Pallas.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import df64 as dfm
from ..ops import dot as dotops
from ..ops import gemv as gemvops


def _matvec(a, x, ar: str):
    """alpha=1, beta=0 accessor GEMV returning f32."""
    z = jnp.zeros((a.shape[0],), jnp.float32)
    return gemvops.acc_gemv(a, x.astype(a.dtype), z, 1.0, 0.0, ar=ar)


def _dot(x, y, ar: str):
    out = dotops.acc_dot(x, y, ar=ar, precise=(ar == "df64"))
    if isinstance(out, dfm.DF):
        return dfm.df_to_f32(out)
    return out.astype(jnp.float32)


class CGState(NamedTuple):
    x: jnp.ndarray
    r: jnp.ndarray
    p: jnp.ndarray
    rs: jnp.ndarray
    it: jnp.ndarray


def cg(a, b, *, iters: int = 50, ar: str = "f32", tol: float = 0.0,
       matvec=None, dot=None):
    """Conjugate gradients on an SPD matrix with accessor kernels.

    Storage dtype comes from `a` (bf16/f16/f32); `ar` sets the arithmetic
    tier for the matvec and the two dot products per iteration ('f32' or
    'df64' — df64 dots stabilize the recurrence when storage is narrow).
    Returns (x, final |r|^2, iterations run).

    `matvec(p) -> f32 vector` and `dot(u, v) -> f32 scalar` may be injected
    to run the same recurrence over different kernels — `parallel.pcg`
    passes mesh-sharded closures so the guarded-update logic lives in
    exactly one place.
    """
    mv = matvec if matvec is not None else (lambda p: _matvec(a, p, ar))
    dt = dot if dot is not None else (lambda u, v: _dot(u, v, ar))
    b32 = b.astype(jnp.float32)
    x0 = jnp.zeros_like(b32)
    r0 = b32
    state0 = CGState(x0, r0, r0, dt(r0, r0), jnp.int32(0))
    if tol == 0.0:
        # fixed iteration budget: no residual exit at all. (An rs > 0 guard
        # still trips on TPU once a converged recurrence underflows rs to
        # exact zero — subnormals flush — which silently turned fixed-budget
        # benchmark runs into ~10-iteration runs.)
        tol2 = jnp.float32(-1.0)
    else:
        tol2 = jnp.float32(tol) ** 2 * dt(b32, b32)

    def cond(s: CGState):
        return jnp.logical_and(s.it < iters, s.rs > tol2)

    def body(s: CGState):
        # guarded updates: once the recurrence has fully converged (rs can
        # underflow to exact 0 — TPU flushes subnormals), remaining
        # fixed-budget iterations become inert instead of 0/0 -> NaN
        ap = mv(s.p)
        den = dt(s.p, ap)
        alpha = jnp.where(den > 0.0, s.rs / jnp.where(den > 0.0, den, 1.0), 0.0)
        x = s.x + alpha * s.p
        r = s.r - alpha * ap
        rs_new = dt(r, r)
        # den < 0 is CG breakdown (non-SPD operator), not convergence:
        # surface it as NaN rs — the while cond (NaN > tol2 is False) exits
        # immediately and callers can tell it apart from a genuine rs -> 0.
        # den == 0 stays the inert converged/subnormal-flush case.
        rs_new = jnp.where(den < 0.0, jnp.float32(jnp.nan), rs_new)
        beta = jnp.where(s.rs > 0.0, rs_new / jnp.where(s.rs > 0.0, s.rs, 1.0), 0.0)
        p = r + beta * s.p
        return CGState(x, r, p, rs_new, s.it + 1)

    out = jax.lax.while_loop(cond, body, state0)
    return out.x, out.rs, out.it


def richardson_refine(a_lo, a_hi, b, *, iters: int = 5, omega: float = 1.0, ar: str = "df64"):
    """Mixed-precision iterative refinement / Richardson iteration:
    the *preconditioner* matvec streams the cheap storage copy `a_lo`
    (e.g. bf16), while the residual is evaluated against the accurate copy
    `a_hi` (f32) with `ar` arithmetic — the storage/arithmetic decoupling in
    solver form. Solves a x = b for diagonally-dominant a.

    Each iteration: r = b - A_hi x (accurate residual), then a two-term
    Neumann preconditioner applied through the cheap copy,
    dx = omega (2 r - omega A_lo r) ~= A^{-1} r, so the per-iteration
    contraction is (I - omega A)^2 instead of (I - omega A) — the extra
    matvec rides the narrow-storage bandwidth.
    """
    b32 = b.astype(jnp.float32)
    x0 = jnp.zeros_like(b32)
    om = jnp.float32(omega)

    def body(x, _):
        r = b32 - _matvec(a_hi, x, ar)
        dx = om * (2.0 * r - om * _matvec(a_lo, r, ar))
        x = x + dx
        return x, _dot(r, r, "f32")

    x, rhist = jax.lax.scan(body, x0, None, length=iters)
    return x, rhist


def power_method(a, *, iters: int = 20, ar: str = "f32", seed: int = 0):
    """Dominant-eigenvalue estimate via accessor GEMV + DOT (single chip;
    the sharded variant is accblas_tpu.parallel.power_step)."""
    n = a.shape[1]
    key = jax.random.PRNGKey(seed)
    x = jax.random.normal(key, (n,), jnp.float32)
    x = x / jnp.sqrt(_dot(x, x, ar))

    def body(x, _):
        y = _matvec(a, x, ar)
        lam = _dot(x.astype(jnp.float32), y, ar)
        y = y / jnp.sqrt(_dot(y, y, ar))
        return y, lam

    x, lams = jax.lax.scan(body, x, None, length=iters)
    return x, lams[-1]
