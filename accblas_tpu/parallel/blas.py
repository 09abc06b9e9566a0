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


def make_mesh(n_devices: int | None = None, axes=("rows", "cols"),
              shape: tuple[int, int] | None = None) -> Mesh:
    """A 2-D mesh over the first n devices: rows × cols, as square as the
    device count allows (8 → 2×4). Pass an explicit ``shape=(rows, cols)``
    to pin a different factorization (1×8, 8×1, 4×2 — the degenerate and
    transposed meshes a real slice topology may force; every op in this
    module must work on all of them, multi-chip readiness pack round 5)."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if shape is not None:
        rows, cols = shape
        if rows * cols != n_devices:
            raise ValueError(f"mesh shape {shape} != {n_devices} devices")
        return Mesh(np.array(devs).reshape(rows, cols), axes)
    rows = 1
    for cand in range(int(np.sqrt(n_devices)), 0, -1):
        if n_devices % cand == 0:
            rows = cand
            break
    return Mesh(np.array(devs).reshape(rows, n_devices // rows), axes)


def _pad_to(v, mult: int, axis: int = 0):
    """Zero-pad one axis up to the next multiple of `mult` (shard_map needs
    mesh-divisible global shapes). Zeros are EXACT no-ops for every
    contraction tier (0·x contributes nothing to f32, df64 two_prod, or
    Kahan chains), so uneven shards cost one O(size) device copy and no
    accuracy. Aligned inputs pass through untouched."""
    sz = v.shape[axis]
    pad = (-sz) % mult
    if pad == 0:
        return v
    widths = [(0, 0)] * v.ndim
    widths[axis] = (0, pad)
    return jnp.pad(v, widths)


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

    ext = mesh.shape[axis]
    return f(_pad_to(x, ext), _pad_to(y, ext))


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

    m = a.shape[0]
    rx, cx = mesh.shape[row_axis], mesh.shape[col_axis]
    if m % rx or a.shape[1] % cx:
        # uneven shards: zero-pad (exact; see _pad_to) and slice the result
        a = _pad_to(_pad_to(a, rx, 0), cx, 1)
        out = f(a, _pad_to(x, cx), _pad_to(res, rx))
        return out[:m]
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

    k = b.shape[1]
    ext = mesh.shape[rhs_axis]
    if k % ext:
        # uneven rhs shards: extra zero columns solve to exact zeros
        return f(a, _pad_to(b, ext, 1))[:, :k]
    return f(a, b)


def ptrsv(
    a,
    b,
    uplo: str = "upper",
    unit: bool = True,
    ar: str = "f32",
    *,
    mesh: Mesh,
    row_axis: str = "rows",
):
    """Row-sharded single-rhs triangular solve: T x = b with T's BLOCK ROWS
    sharded over `row_axis` (each chip owns an (n/d, n) row panel — the
    memory-scaling decomposition ptrsm's replicated-T form lacks).

    Block substitution over the d shards, dependency-ordered (last shard
    first for upper, first for lower). Per step every chip redundantly
    solves its OWN diagonal block against its running residual (the solve is
    (n/d)² — cheap), one `all_gather` selects the step-owner's solution, and
    every chip subtracts its local panel column against it. Only the
    step-owner's candidate is ever read, so the garbage candidates of
    already-solved / not-yet-reached chips are dead values, never wrong
    ones. d local solves + d all_gathers of n/d lanes ride ICI; the O(n²)
    panel updates run row-parallel across the mesh.

    `ar` sets the local diagonal-solve tier; cross-shard panel updates run
    f32 at HIGHEST (a DF-carried cross-chip residual is the ptrsm/df64
    route's job). Uneven n pads T with an identity tail and b with zeros —
    the padded lanes solve to exact zeros and are sliced away.
    """
    from ..ops import trsv as trsvops

    n = a.shape[0]
    d = mesh.shape[row_axis]
    lower = uplo == "lower"
    pad = (-n) % d
    if pad:
        a = jnp.pad(a, ((0, pad), (0, pad)))
        # identity tail keeps the padded diagonal solvable (x_pad = 0)
        ii = jnp.arange(n, n + pad)
        a = a.at[ii, ii].set(1.0)
        b = jnp.pad(b, (0, pad))
    npad = n + pad
    m = npad // d

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(row_axis, None), P(row_axis)),
        out_specs=P(row_axis),
        check_vma=False,  # pallas_call out_shapes carry no vma metadata
    )
    def f(t_blk, b_blk):
        idx = jax.lax.axis_index(row_axis)
        dblk = jax.lax.dynamic_slice(t_blk, (0, idx * m), (m, m))
        acc = b_blk.astype(jnp.float32)
        x_local = jnp.zeros((m,), jnp.float32)
        hi = jax.lax.Precision.HIGHEST
        order = range(d) if lower else range(d - 1, -1, -1)
        for s in order:
            cand = trsvops.acc_trsv(
                dblk.astype(t_blk.dtype), acc.astype(b_blk.dtype), uplo, unit,
                ar=ar, unstable_ok=True,
            )
            if isinstance(cand, dfm.DF):
                cand = dfm.df_to_f32(cand)
            x_s = jax.lax.all_gather(cand.astype(jnp.float32), row_axis)[s]
            x_local = jnp.where(idx == s, x_s, x_local)
            # panel update against the step's solution — harmless garbage on
            # chips whose candidates are never read again (own diag block /
            # dead-triangle L data of the packed factor)
            panel = t_blk[:, s * m : (s + 1) * m].astype(jnp.float32)
            acc = acc - jnp.matmul(
                panel, x_s[:, None], precision=hi
            )[:, 0]
        return x_local.astype(b_blk.dtype)

    x = f(a, b)
    return x[:n] if pad else x


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
