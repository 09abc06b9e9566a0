"""Multi-chip sharded BLAS — the ICI extension beyond reference parity.

The reference is strictly single-GPU (SURVEY.md §2 "Parallelism &
communication": no NCCL/MPI, device 0 hardcoded at
``cuda/dot_kernels.cuh:33``). On TPU the natural scale-out is a
``jax.sharding.Mesh`` with XLA collectives over ICI — so the framework ships
sharded DOT/GEMV built from the same Pallas kernels:

- `pdot`: vectors sharded over one axis; each chip runs the local accessor
  DOT, one `psum` combines partials (df64 partials psum component-wise —
  hi/lo are a pytree).
- `pgemv`: A sharded over a 2-D (rows × cols) mesh — row-parallel output,
  column-parallel contraction with a `psum` over the cols axis (Megatron-style
  tensor parallelism for a matvec); x rides sharded over cols, the result is
  row-sharded.
- `power_step`: a full mixed-precision iteration composed from the sharded
  ops (the dryrun_multichip workload): y = alpha·A@x + beta·r, its norm via
  sharded DOT, then a normalized update — exercising both mesh axes, psum on
  each, and an XLA-inserted reshard between differently-sharded operands.
- `pcg`: mesh-sharded conjugate gradients — the application tier scaled out,
  with the Krylov dots optionally at df64 through the exact DF combine.

Collectives ride ICI via the mesh; nothing here talks to DCN explicitly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..ops import df64 as dfm
from ..ops import dot as dotops
from ..ops import gemv as gemvops


def make_mesh(n_devices: int | None = None, axes=("rows", "cols")) -> Mesh:
    """A 2-D mesh over the first n devices: rows × cols, as square as the
    device count allows (8 → 2×4)."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    rows = 1
    for cand in range(int(np.sqrt(n_devices)), 0, -1):
        if n_devices % cand == 0:
            rows = cand
            break
    return Mesh(np.array(devs).reshape(rows, n_devices // rows), axes)


def pdot(x, y, mesh: Mesh, axis: str = "cols", ar: str = "f32", precise: bool = False):
    """Sharded DOT: local accessor DOT per chip, combined over `axis`.

    Fixed/f32 tiers combine with one `psum`. The df64 tier must NOT psum the
    DF (hi, lo) pytree component-wise: hi and lo would each be summed
    independently in f32, so the rounding of the hi-sum (~2^-24 of the
    partial magnitudes) is captured nowhere and cross-chip cancellation
    degrades the result from df64 (~2^-48) toward f32 accuracy. Instead the
    per-chip DF partials ride one `all_gather` (shard counts are small — a
    few lanes over ICI) and every chip folds them with an exact `df_add`
    chain, preserving the full double-float width end-to-end."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,  # pallas_call out_shapes carry no vma metadata
    )
    def f(xb, yb):
        local = dotops.acc_dot(xb, yb, ar=ar, precise=precise)
        if ar == "df64":
            his = jax.lax.all_gather(local.hi, axis)  # (n_shards,)
            los = jax.lax.all_gather(local.lo, axis)
            return dfm.df_sum(dfm.DF(his, los))
        return jax.lax.psum(local, axis)

    return f(x, y)


def pgemv(
    a,
    x,
    res,
    alpha=1.0,
    beta=1.0,
    ar: str = "f32",
    *,
    mesh: Mesh,
    row_axis: str = "rows",
    col_axis: str = "cols",
):
    """Sharded GEMV: res = alpha·A@x + beta·res with A sharded (rows, cols),
    x sharded (cols), res/result sharded (rows). One psum over the cols axis.

    df64 combine: per-chip partials ride as UNROUNDED DF pairs
    (`acc_gemv(..., df_out=True)`) through one `all_gather` and an exact
    `df_add` fold, so the contraction keeps df64 width end-to-end; alpha/beta
    apply in DF and the single rounding to the output storage happens last —
    the same discipline as pdot's combine (a component-wise psum of hi/lo
    would silently drop the hi-sum rounding). f32/fixed tiers use one psum."""

    # beta == 0 (static) must not read res — it may be uninitialized
    # (0.0 * NaN = NaN); same vendor semantics the kernel epilogues and
    # xla_gemv enforce. Traced alpha/beta stay runtime values (asarray, not
    # np.float32 which would concretize a tracer).
    beta_is_static_zero = isinstance(beta, (int, float)) and float(beta) == 0.0

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(row_axis, col_axis), P(col_axis), P(row_axis)),
        out_specs=P(row_axis),
        check_vma=False,  # pallas_call out_shapes carry no vma metadata
    )
    def f(a_blk, x_blk, r_blk):
        zero = jnp.zeros_like(r_blk, jnp.float32)
        if ar == "df64":
            part = gemvops.acc_gemv(
                a_blk, x_blk, zero, 1.0, 0.0, ar="df64", df_out=True
            )
            his = jax.lax.all_gather(part.hi, col_axis)  # (n_shards, m_local)
            los = jax.lax.all_gather(part.lo, col_axis)
            tot = dfm.df_sum(dfm.DF(his, los), axis=0)
            out = dfm.df_mul_f32(tot, jnp.asarray(alpha, jnp.float32))
            if not beta_is_static_zero:
                out = dfm.df_add(
                    out,
                    dfm.df_from(
                        r_blk.astype(jnp.float32) * jnp.asarray(beta, jnp.float32)
                    ),
                )
            return dfm.df_to_f32(out).astype(r_blk.dtype)
        part = gemvops.acc_gemv(a_blk, x_blk, zero, 1.0, 0.0, ar=ar)
        total = jax.lax.psum(part, col_axis)
        out = alpha * total
        if not beta_is_static_zero:
            out = out + beta * r_blk.astype(jnp.float32)
        return out.astype(r_blk.dtype)

    return f(a, x, res)


def ptrsm(
    a,
    b,
    uplo: str = "upper",
    unit: bool = True,
    ar: str = "f32",
    *,
    mesh: Mesh,
    rhs_axis: str = "cols",
):
    """Sharded multi-RHS triangular solve: T X = B with the right-hand sides
    sharded over `rhs_axis` and T replicated.

    TRSM's columns are independent solves, so the TPU-native decomposition is
    embarrassingly parallel over the rhs axis — each chip runs the local
    Pallas TRSM on its (n, k/axis) panel, zero collectives in the solve (the
    triangle is broadcast once by the sharding layer). Linear scaling in k;
    contrast with the reference's single-GPU TRSV which has no multi-rhs or
    multi-device form at all (``cuda/trsv_kernels.cuh``)."""
    from ..ops import trsv as trsvops

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, rhs_axis)),
        out_specs=P(None, rhs_axis),
        check_vma=False,  # pallas_call out_shapes carry no vma metadata
    )
    def f(t_blk, b_blk):
        return trsvops.acc_trsm(t_blk, b_blk, uplo, unit, ar=ar)

    return f(a, b)


def _df_or_f32(v):
    return dfm.df_to_f32(v) if isinstance(v, dfm.DF) else v.astype(jnp.float32)


def pcg(a, b, *, mesh: Mesh, iters: int = 50, ar: str = "f32", tol: float = 0.0,
        row_axis: str = "rows", col_axis: str = "cols"):
    """Mesh-sharded conjugate gradients — the application tier scaled out.

    Literally ``models.solvers.cg`` — the guarded fixed-budget recurrence
    lives there, in one place — with mesh-sharded closures injected: every
    matvec is a tensor-parallel `pgemv` (psum over `col_axis`) and every dot
    a sharded `pdot`; the reference has no distributed code at all
    (SURVEY.md §2 "Parallelism & communication"). A is (rows, cols)-sharded;
    all vectors live cols-sharded and the rows-sharded matvec output
    reshards back via `with_sharding_constraint` (XLA inserts the
    all-to-all over ICI, exactly as in `power_step`). `ar` sets the
    arithmetic tier of the matvec and the two Krylov dots per iteration,
    matching the single-chip solver — `ar='df64'` routes the dots through
    the exact cross-chip DF combine, so the recurrence coefficients keep
    double-float width even though each chip only ever sees a shard.

    Returns (x cols-sharded, final |r|^2, iterations run).
    """
    from ..models import solvers

    cols = NamedSharding(mesh, P(col_axis))
    b32 = jax.lax.with_sharding_constraint(b.astype(jnp.float32), cols)
    zero_rows = jax.lax.with_sharding_constraint(
        jnp.zeros_like(b32), NamedSharding(mesh, P(row_axis))
    )

    def matvec(p):
        ap = pgemv(a, p.astype(a.dtype), zero_rows, 1.0, 0.0, ar=ar,
                   mesh=mesh, row_axis=row_axis, col_axis=col_axis)
        return jax.lax.with_sharding_constraint(ap.astype(jnp.float32), cols)

    def dot(u, v):
        return _df_or_f32(pdot(u, v, mesh, axis=col_axis, ar=ar,
                               precise=(ar == "df64")))

    return solvers.cg(a, b32, iters=iters, ar=ar, tol=tol,
                      matvec=matvec, dot=dot)


def power_step(a, x, r, *, mesh: Mesh, ar: str = "f32"):
    """One full sharded iteration (the dryrun/training-step workload):
    y = A@x + r (TP psum over cols), nu = <y, y> (psum over rows),
    x' = all-gathered y / sqrt(nu) resharded onto the cols axis."""
    y = pgemv(a, x, r, 1.0, 1.0, ar=ar, mesh=mesh)
    nu = pdot(y, y, mesh, axis="rows", ar=ar)
    y_norm = y * jax.lax.rsqrt(_df_or_f32(nu) + 1e-30)
    # reshard rows → cols for the next iteration (XLA inserts the collective)
    x_next = jax.lax.with_sharding_constraint(
        y_norm, NamedSharding(mesh, P("cols"))
    )
    return x_next, nu
