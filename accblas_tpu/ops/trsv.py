"""TRSV kernels: solve T x = b for a dense triangular T (upper/lower,
unit/non-unit diagonal).

TPU-native rebuild of the reference's TRSV family (``cuda/trsv_kernels.cuh``,
1008 LoC — its hardest component, after "A Fast Dense Triangular Solve in
CUDA", doi 10.1137/12088358X). The CUDA implementation is a single-launch
blocked substitution where each thread block (1) grabs a block-row ticket via
``atomicInc`` (``:94-97``), (2) inverts its 32×32 diagonal block in shared
memory by Gauss–Jordan (``:125-162``), (3) spin-waits on a global flag until
the previous block-columns are solved (``:171-179``), accumulates the
correction, and (4) publishes its solution with ``__threadfence`` ordering
(``:229-234``).

On TPU all of that synchronization machinery collapses into compiler-visible
structure:

- **Phase 1 (batched, MXU)**: all diagonal blocks are masked to their
  triangle (unit diagonal handled here — ``dmtx_t`` analogue,
  ``cuda/trsv_kernels.cuh:22-29``) and inverted *in parallel* with a batched
  triangular solve — the Gauss–Jordan-in-shared-memory step
  (``cuda/trsv_kernels.cuh:125-162``), hoisted out of the sequential sweep.
- **Phase 2 (Pallas sweep)**: a 1-D grid enumerating exactly the live
  triangle blocks in dependency order — (block-row i, block-column j <= i)
  pairs delivered via scalar prefetch, so the ticket + spin-lock +
  threadfence protocol is simply grid order on a TPU core and the dead half
  of a rectangular grid never runs (a rectangular 2-D grid with dead-step
  DMA aliasing measured ~36% per-step overhead at n=16384). The solved
  prefix of x lives in a VMEM scratch carried across steps (the published-x
  global array analogue), corrections accumulate per block-row, and the
  diagonal step applies the pre-inverted leaf blocks via the MXU.
- **TRSM**: the same sweep with nrhs right-hand sides carried as (k, B)
  row-panels — the per-step vector dots become (k, B)x(B, B) MXU GEMMs.
  The reference has no TRSM; this generalizes its TRSV design.

The accessor tier (``acc_trsv``, reference ``cuda/trsv_kernels.cuh:918-961``)
decouples storage (bf16/f32) from arithmetic: cast-on-load feeds the f32 MXU
path. ar='df64' runs the SAME one-pass sweep with the solved panels and the
correction accumulator carried as double-float (hi, lo) VMEM pairs — the
TPU-native equivalent of the reference holding shared memory in the
*arithmetic* type (``cuda/trsv_kernels.cuh:546,744``, ``ar_type`` shared
memory), so Acc<df64,f32> streams the triangle exactly once and runs at
storage speed. (In the VMEM-resident small-n regime the df64 tier instead
uses one step of iterative refinement with a df64-exact residual — there the
f32 solves are compiler-resident and the extra pass is cheap.)

``cublas_trsv`` (``cuda/trsv_kernels.cuh:964-1008``) maps to `xla_trsv`
(XLA's native TriangularSolve, which reads the wanted triangle of a full
matrix exactly like cuBLAS).
"""

from __future__ import annotations

import functools
import warnings

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accessor import dtypes
from ..accessor.range import Range, ReducedRowMajor
from . import df64 as dfm
from .common import compiler_params, interpret_default, tri_mask

# block size: balances per-step overhead against DMA granularity (measured on
# v5e at n=16384: 512 -> 278 GFLOP/s vs 256 -> 186)
BLOCK = 512
# single-rhs sweeps go bigger under the 64 MiB VMEM scope (round-3 probe,
# scripts/probe_r3b.py: at 24576 f32 350 vs 306, df64 314 vs 273 GF/s; TRSM
# panels prefer 512 — 21.5 vs 19.6 TF/s — their MXU work already fills the
# step, and the wider block halves the rhs-group VMEM budget)
BLOCK_VEC = 1024
# leaf size for the two-level diagonal solve: only leaf x leaf diagonal
# sub-blocks are inverted in phase 1 (B/leaf fewer flops than inverting the
# full diagonal block: 33 Mflop vs 2.1 Gflop at n=16384), and the kernel
# substitutes through the diagonal block with leaf-granular MXU dots
LEAF = 64
# single-rhs sweeps at BLOCK_VEC shorten the serial in-block substitution
# chain with a 4x bigger leaf (16 -> 4 leaf-dots per diagonal block): probe
# r4b on v5e at n=24576 measured f32 349.4/360.9/362.1/361.6/334.8 and df64
# 313.5/342.3/342.7/342.7/317.8 GF/s for leaf 64/128/256/512/1024 — 256 and
# 512 tie; 256 keeps the phase-1 inversion flops 4x lower. TRSM (block=512,
# wide panels) was NOT probed and keeps LEAF=64.
LEAF_VEC = 256

# beyond this n the bf16-storage recurrence error reaches the percent range
# on LU-factor triangles (measured: 3.1e-2 at n=1024 rising to 0.95 at 24576,
# bench_results/trsv_error.csv) — the tier is throughput-only there
BF16_STABLE_N = 1024

# TRSM rhs-chunking gate (round 5): at n >= _TRSM_CHUNK_N, panels wider
# than _TRSM_CHUNK_K are solved in _TRSM_CHUNK_K-column chunks — the
# unrolled blocked schedule at (nb=32 steps) x (k=512) exhausts XLA:TPU
# compile resources for every tier (bench_results/trsm_rhs512.log), while
# k=128 at the same n is the measured headline configuration. Columns are
# independent, so chunking is exact. Module-level so tests/probes can
# exercise the chunk path at small shapes.
_TRSM_CHUNK_N = 16384
_TRSM_CHUNK_K = 128


def _extract_leaf_diag(a, nb: int, block: int, leaf: int, interpret):
    """Extract the leaf-diagonal blocks as (nb·B/leaf, leaf, leaf).

    One Pallas pass: the DMA pulls exactly the nb block-diagonal (B, B)
    tiles (an XLA gather over the full n² matrix lowers catastrophically —
    measured ~10 ms at n=16384 vs ~0.04 ms of actual bytes) and the kernel
    emits the leaf diagonals with STATIC slices, always in f32. The former
    two-stage form (Pallas DMA + jnp advanced-indexing gather on the small
    stack) hit a pathological XLA:TPU compile when the gather sat inside a
    fori_loop — ~3 minutes per (shape, variant) at small n (round-3 bisect).
    The cast to f32 happens ARRAY-LEVEL on the full aligned block before any
    slicing: a leaf=64 slice sits at a half-lane offset, and Mosaic's 16-bit
    sub-lane relayout for bf16 slices cost ~20% of the whole solve (bf16
    column 394 -> 323 GF/s at n=24576 when the slices read bf16 directly)."""
    nleaf = block // leaf

    def kern(a_ref, o_ref):
        a_f32 = a_ref[...].astype(jnp.float32)
        for s in range(nleaf):
            o_ref[0, s] = a_f32[s * leaf : (s + 1) * leaf, s * leaf : (s + 1) * leaf]

    d = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[pl.BlockSpec((block, block), lambda i: (i, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (1, nleaf, leaf, leaf), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nb, nleaf, leaf, leaf), jnp.float32),
        compiler_params=compiler_params(dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(a)
    return d.reshape(nb * nleaf, leaf, leaf)


def _leaf_inverses(a, nb: int, block: int, leaf: int, lower: bool, unit: bool, interpret,
                   n: int | None = None):
    """Batched masked inversion of the leaf x leaf diagonal sub-blocks,
    transposed for the row-form sweep (phase 1 — the Gauss-Jordan-in-shared-
    memory role, ``cuda/trsv_kernels.cuh:125-162``, hoisted out of the
    sequential sweep and batched). Returns (nb, B/leaf, leaf, leaf) float32.

    When the logical size `n` is not a block multiple the matrix arrives
    UNPADDED (zero-copy ragged path): the boundary diagonal tile's
    out-of-bounds lanes read unspecified values, which are masked to an
    identity continuation here (rows/cols past n -> 0 off-diagonal, 1 on the
    diagonal) so padding lanes solve to x = 0 against the zero-padded rhs."""
    m = nb * block // leaf
    d = _extract_leaf_diag(a, nb, block, leaf, interpret)  # (m, leaf, leaf) f32
    ragged = n is not None and n != nb * block
    offs = jnp.arange(m, dtype=jnp.int32) * leaf if ragged else None
    inv = _masked_tri_inverse(d, lower, unit, n=n if ragged else None, offs=offs)
    return inv.transpose(0, 2, 1).reshape(nb, block // leaf, leaf, leaf)


def _masked_tri_inverse(d, lower: bool, unit: bool, *, n=None, offs=None):
    """Inverse of a (g, s, s) stack of triangular blocks: zero the dead
    triangle, force a unit diagonal if requested, and — when `offs` carries
    per-block global row offsets against a logical size `n` — continue
    past-`n` lanes as identity so padding solves to x = 0. The solve runs at
    HIGHEST precision: TPU's default matmul precision truncates f32 operands
    to bf16 inside XLA's blocked TriangularSolve, and this phase must match
    the f32 Pallas/Mosaic dots in the sweep."""
    s = d.shape[-1]
    d = tri_mask(d, lower, unit, n=n, offs=offs)
    eye = jnp.broadcast_to(jnp.eye(s, dtype=jnp.float32), d.shape)
    with jax.default_matmul_precision("highest"):
        return jax.lax.linalg.triangular_solve(
            d, eye, left_side=True, lower=lower, unit_diagonal=False
        )


def _df_tri_inverse(d, lower: bool, unit: bool):
    """f32 inverse of a (g, s, s) triangular-block stack, correctly rounded.

    PROBE-ONLY — REJECTED ON HARDWARE as a default route (probe_r4g_hw,
    commit a10da35): the hypothesis was that this pure-HLO double-float
    setup would hoist out of repeated-solve loops like the f32
    ``triangular_solve`` it replaces, making its cost free in the warm
    regime. The v5e measurement says otherwise — XLA does NOT hoist the
    scan-based DF substitution (2.7 GF/s warm at n=24576, i.e. the setup
    re-ran inside the timed loop), so the route lost to the shipped
    per-application refinement and the aligned-large-n Pallas-sweep
    reroute. Kept (behind ``_PROBE_SETUP_DF64_INV``) as the measured
    record of WHY inv-setup-in-HLO is dead, and because the numerics
    remain valid: products are exact (``two_prod``), the carried inverse
    rows and accumulators are (hi, lo) pairs, so the returned ``hi`` is
    fl32 of the exact inverse of the stored block; the probe_r4f/r4g
    numpy model showed inv-only application of such a rounding-class
    inverse lands below substitution-class error (1-norm 3.1e-6 vs
    f32-inverse 2.1e-5 at n=1024 with 512-blocks)."""
    g, s, _ = d.shape
    d = tri_mask(d, lower, unit)
    idx = jnp.arange(s)

    def one(db):  # (s, s) f32 triangle -> (s, s) f32 inverse
        def step(carry, i):
            xhi, xlo = carry
            row = jax.lax.dynamic_slice(db, (i, 0), (1, s))[0]
            row = jnp.where(idx < i if lower else idx > i, row, 0.0)
            # sum_k row[k] * X[k, :] in double-float (exact products,
            # pairwise DF accumulation)
            prod = dfm.df_mul_f32(dfm.DF(xhi, xlo), row[:, None])
            acc = dfm.df_sum(prod, axis=0)
            e_i = (idx == i).astype(jnp.float32)
            num = dfm.df_sub(dfm.DF(e_i, jnp.zeros_like(e_i)), acc)
            if unit:
                qhi, qlo = num.hi, num.lo
            else:
                dii = jax.lax.dynamic_slice(db, (i, i), (1, 1))[0, 0]
                q1 = num.hi / dii
                p, pe = dfm.two_prod(q1, dii)
                r = dfm.df_sub(num, dfm.DF(p, pe))
                q2 = (r.hi + r.lo) / dii
                qhi, qlo = dfm.fast_two_sum(q1, q2)
            xhi = jax.lax.dynamic_update_slice(xhi, qhi[None], (i, 0))
            xlo = jax.lax.dynamic_update_slice(xlo, qlo[None], (i, 0))
            return (xhi, xlo), None

        z = jnp.zeros((s, s), jnp.float32)
        order = jnp.arange(s) if lower else jnp.arange(s - 1, -1, -1)
        (xhi, _), _ = jax.lax.scan(step, (z, z), order)
        return xhi  # DF invariant |lo| <= ulp(hi)/2: hi is the rounded inverse

    return jax.vmap(one)(d)


def _dot_t(x, blk, precision):
    """x (k, B) · blk(B', B)^T -> (k, B') f32 on the MXU."""
    return jax.lax.dot_general(
        x,
        blk,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


_HI = jax.lax.Precision.HIGHEST


def _trsv_kernel(
    ij_ref,
    a_ref,
    invt_ref,
    b_ref,
    x_out_ref,
    *scratch,
    nb: int,
    lower: bool,
    leaf: int,
    ar: str,
    n_total: int,
    block: int,
    spec_a: ReducedRowMajor,
    spec_b: ReducedRowMajor,
    spec_out: ReducedRowMajor,
):
    df = ar == "df64"
    if df:
        x_hi, x_lo, corr_hi, corr_lo = scratch
    else:
        (x_scr, corr_hi) = scratch
    t = pl.program_id(0)
    i = ij_ref[0, t]
    j = ij_ref[1, t]
    # logical block coordinates (reversed sweep for upper triangles —
    # reference upper_trsv walks from the bottom-right, cuda/trsv_kernels.cuh:306-309)
    bi = i if lower else nb - 1 - i
    bj = j if lower else nb - 1 - j

    @pl.when(j == 0)
    def _reset():
        corr_hi[...] = jnp.zeros_like(corr_hi)
        if df:
            corr_lo[...] = jnp.zeros_like(corr_lo)

    # accessor cast-on-load: the kernel body is written against ranges
    # (reference pattern cuda/trsv_kernels.cuh:527-692 — one kernel, range
    # args). For df64 arithmetic the raw load feeds the f32 carrier of the
    # DF value (exact for f32/bf16 storage), as ops.dot does.
    ra = Range(spec_a, a_ref, const=True)
    rb = Range(spec_b, b_ref, const=True)
    ro = Range(spec_out, x_out_ref)
    if df:
        a_blk = ra.load_raw().astype(jnp.float32)
    else:
        a_blk = ra.load()
    if n_total % block != 0:
        # zero-copy ragged path: the matrix arrives unpadded, so boundary
        # tiles read unspecified out-of-bounds values (possibly NaN/inf —
        # they would poison the MXU dots even against zero x lanes, the same
        # hazard gemv's colform masks). Zero every lane past n; the diagonal
        # identity continuation lives in the pre-masked leaf inverses. The
        # select runs unconditionally: gating it under lax.cond on the
        # boundary-tile predicate measured SLOWER (bf16 282 -> 228, df64
        # 243 -> 195 GF/s at n=23680 — Mosaic pays the branch more than the
        # ~12% the always-on select costs).
        rr = jax.lax.broadcasted_iota(jnp.int32, a_blk.shape, 0) + bi * block
        cc = jax.lax.broadcasted_iota(jnp.int32, a_blk.shape, 1) + bj * block
        a_blk = jnp.where((rr < n_total) & (cc < n_total), a_blk, 0.0)

    @pl.when(j < i)
    def _update():
        # correction += x[bj] · A(bi, bj)^T  — the "consume published block
        # columns" step (cuda/trsv_kernels.cuh:184-199); the solved block
        # rides as a (k, B) row-panel so nrhs > 1 turns this into an MXU GEMM
        if df:
            # df64 carry (the reference's ar_type shared memory,
            # cuda/trsv_kernels.cuh:546,744): hi·A needs genuine f32 (HIGHEST
            # — the TPU default truncates f32 MXU operands to bf16); lo·A is
            # 2^-24 down, so the default-precision single pass is already
            # below the f32 product floor. Both partials fold into the DF
            # accumulator with exact two_sum capture.
            t_hi = _dot_t(x_hi[bj], a_blk, _HI)
            t_lo = _dot_t(x_lo[bj], a_blk, None)
            acc = dfm.DF(corr_hi[...], corr_lo[...])
            acc = dfm.df_add(acc, dfm.df_from(t_hi))
            acc = dfm.df_add(acc, dfm.df_from(t_lo))
            corr_hi[...] = acc.hi
            corr_lo[...] = acc.lo
        else:
            corr_hi[...] = corr_hi[...] + _dot_t(x_scr[bj], a_blk, _HI)

    @pl.when(j == i)
    def _solve():
        # two-level diagonal solve (the inv(L_diag)·(rhs - corr) step,
        # cuda/trsv_kernels.cuh:212-228): substitute through the diagonal
        # block at leaf granularity using the pre-inverted leaf blocks —
        # the a_blk slices are static, the dots ride the MXU
        nleaf = a_blk.shape[0] // leaf
        order = range(nleaf) if lower else range(nleaf - 1, -1, -1)
        xs = [None] * nleaf
        if df:
            b_val = rb.load_raw()[0].astype(jnp.float32)
            rhs = dfm.df_sub(dfm.df_from(b_val), dfm.DF(corr_hi[...], corr_lo[...]))
            for s in order:
                r_s = rhs[:, s * leaf : (s + 1) * leaf]
                deps = range(s) if lower else range(s + 1, nleaf)
                for t2 in deps:
                    d_st = a_blk[s * leaf : (s + 1) * leaf, t2 * leaf : (t2 + 1) * leaf]
                    r_s = dfm.df_add(r_s, dfm.df_from(-_dot_t(xs[t2].hi, d_st, _HI)))
                    r_s = dfm.df_add(r_s, dfm.df_from(-_dot_t(xs[t2].lo, d_st, None)))
                inv_s = invt_ref[0, s]
                v_hi = jax.lax.dot_general(
                    r_s.hi, inv_s, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_HI,
                )
                v_lo = jax.lax.dot_general(
                    r_s.lo, inv_s, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                xs[s] = dfm.df_add(dfm.df_from(v_hi), dfm.df_from(v_lo))
            x_row = dfm.DF(
                jnp.concatenate([v.hi for v in xs], axis=1),
                jnp.concatenate([v.lo for v in xs], axis=1),
            )
            x_hi[bi] = x_row.hi  # publish (threadfence+flag analogue)
            x_lo[bi] = x_row.lo
        else:
            rhs = rb.load()[0] - corr_hi[...]
            for s in order:
                r_s = rhs[:, s * leaf : (s + 1) * leaf]
                deps = range(s) if lower else range(s + 1, nleaf)
                for t2 in deps:
                    d_st = a_blk[s * leaf : (s + 1) * leaf, t2 * leaf : (t2 + 1) * leaf]
                    r_s = r_s - _dot_t(xs[t2], d_st, _HI)
                xs[s] = jax.lax.dot_general(
                    r_s,
                    invt_ref[0, s],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_HI,
                )
            x_row = jnp.concatenate(xs, axis=1)
            x_scr[bi] = x_row  # publish (threadfence+flag analogue)
        # accessor cast-on-store (DF values round hi+lo to storage)
        ro.store(x_row, idx=0)


def _tri_pairs(nb: int, lower: bool):
    """Dependency-ordered (i, j<=i) enumeration of the live triangle blocks,
    as an int32 (2, steps) array for scalar prefetch (the ticket order,
    cuda/trsv_kernels.cuh:94-97, computed host-side instead of atomicInc)."""
    import numpy as np

    pairs = [(i, j) for i in range(nb) for j in range(i + 1)]
    ij = np.asarray(pairs, np.int32).T.copy()
    return jnp.asarray(ij)


def _trsv_sweep(a, invt, b2, nb: int, block: int, lower: bool, st_out: str, interpret,
                leaf: int = LEAF, nrhs: int = 1, ar: str = "f32",
                n_total: int | None = None):
    if n_total is None:
        n_total = nb * block
    steps = nb * (nb + 1) // 2
    ij = _tri_pairs(nb, lower)
    df = ar == "df64"
    st_a = dtypes.canon(a.dtype)
    st_b = dtypes.canon(b2.dtype)

    def a_index(t, ij_ref):
        i = ij_ref[0, t]
        j = ij_ref[1, t]
        if lower:
            return (i, j)
        return (nb - 1 - i, nb - 1 - j)

    def row_index(t, ij_ref):
        i = ij_ref[0, t]
        return (i, 0, 0) if lower else (nb - 1 - i, 0, 0)

    kernel = functools.partial(
        _trsv_kernel,
        nb=nb,
        lower=lower,
        leaf=leaf,
        ar=ar,
        n_total=n_total,
        block=block,
        spec_a=ReducedRowMajor(ar, st_a),
        spec_b=ReducedRowMajor(ar, st_b),
        spec_out=ReducedRowMajor(ar, st_out),
    )
    if df:
        scratch_shapes = [
            pltpu.VMEM((nb, nrhs, block), jnp.float32),  # solved x hi
            pltpu.VMEM((nb, nrhs, block), jnp.float32),  # solved x lo
            pltpu.VMEM((nrhs, block), jnp.float32),  # correction hi
            pltpu.VMEM((nrhs, block), jnp.float32),  # correction lo
        ]
    else:
        scratch_shapes = [
            pltpu.VMEM((nb, nrhs, block), jnp.float32),  # solved x panels
            pltpu.VMEM((nrhs, block), jnp.float32),  # correction accumulator
        ]
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((block, block), a_index, memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, block // leaf, leaf, leaf),
                    lambda t, ij_ref: (row_index(t, ij_ref)[0], 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                # rows ride as (nb, k, block): Mosaic requires the last two
                # block dims be 8/128-divisible or equal to the array dims
                pl.BlockSpec((1, nrhs, block), row_index, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, nrhs, block), row_index, memory_space=pltpu.VMEM),
            scratch_shapes=scratch_shapes,
        ),
        out_shape=jax.ShapeDtypeStruct((nb, nrhs, block), dtypes.jnp_dtype(st_out)),
        compiler_params=compiler_params(
            dimension_semantics=("arbitrary",),
            # v5e VMEM is 128 MiB; the 16 MiB scoped default caps the df64
            # TRSM scratch pairs and the BLOCK=1024 probe
            vmem_limit_bytes=64 * 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=nb * (nb + 1) * block * block * nrhs,
            bytes_accessed=(nb * (nb + 1) // 2) * block * block * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ij, a, invt, b2.reshape(nb, nrhs, block))
    return out


def _pad_packed(a, bt, block: int):
    """Pad the LU-packed matrix to a block multiple with an identity diagonal
    (padding rows solve to x = 0 for zero-padded rhs). `bt` is the rhs —
    (n,) for a single vector or (k, n) row-panel form."""
    n = a.shape[0]
    nb = pl.cdiv(n, block)
    npad = nb * block
    if npad != n:
        a = jnp.pad(a, ((0, npad - n), (0, npad - n)))
        pad_idx = jnp.arange(n, npad)
        a = a.at[pad_idx, pad_idx].set(1.0)
        if bt.ndim == 1:
            bt = jnp.pad(bt, (0, npad - n))
        else:
            bt = jnp.pad(bt, ((0, 0), (0, npad - n)))
    return a, bt, nb, npad


# VMEM budget for the solved-x scratch (nb * nrhs * block * 4 bytes per
# carried panel; df64 carries hi+lo pairs): split wide right-hand-side
# panels into groups no bigger than this
_TRSM_SCR_BYTES = 6 * 2**20

# below this n any storage dtype routes to the XLA-composed blocked
# substitution (the f32 materialization it implies is cheap when the matrix
# is VMEM-scale). Beyond it, f32-storage single-rhs solves STILL route there:
# the round-3 probe (scripts/probe_r3e.py) measured the XLA-composed schedule
# at 356-367 GF/s from n=8192 to 24576 — above the Pallas sweep at every size
# (299/336/350 at 8192/16384/24576) and nearly immune to ragged n (360 vs the
# sweep's 194 at 12416) — 90% of the 819 GB/s triangle roofline. The Pallas
# sweep remains the engine for narrow storage (bf16 streams at storage
# bandwidth, 393 GF/s at 24576 — an f32 materialization would forfeit it),
# for the fused df64 tier, and for multi-rhs TRSM (MXU GEMM panels).
RESIDENT_N = 2048


# round-5 narrow-storage block retune (probe_r5m + probe_r5n on v5e): in the
# per-slice convert-feed regime (k < 32, n > RESIDENT_N) every narrow tier
# streams BLOCK_VEC=1024 blocks faster than BLOCK=512 at every probed
# n >= 4096 — f8 862/996/1101/1128 vs 606/737/884/969 GF/s and bf16
# 746/743/745/744 vs 554/625/675/692 at 4096/8192/16384/24576 (f16 rides the
# bf16 curve; 745 IS the bf16 GEMV stream tier, so 512 was leaving pure
# bandwidth on the table, and 1536/2048 lose it again: 851/805 f8 at 24576).
# probe_r5p then pinned the crossover: 1024 wins at EVERY size down to the
# first per-slice size (bf16 649 vs 450 and f8 685 vs 475 at n=2176, the
# margin widening through 2560/3072/3584), so the gate is the per-slice
# regime boundary itself, n > RESIDENT_N.
# f32 storage keeps _block_for's 512: aligned n >= 8192 rides the Pallas
# sweep anyway, the blocked route's error captures (trsv_error.csv) are
# 512-vintage, and ragged f32 measured only +1.5% at 1024 (probe_r5n) — not
# worth invalidating them. f8 arithmetic error moves within the blocked
# inv-apply class: 5.9e-5 at 1024 vs 4.7e-5 at 512 (probe_r5m, against the
# f64 solve of the quantized operand; 2048 degrades to 1.5e-4 AND loses
# speed, so the wide end is doubly rejected).
_NARROW_BLOCK_N = RESIDENT_N + 1


def _small_block_for(n: int, k: int, f32_storage: bool) -> int:
    """Block size for the XLA-composed blocked route (see _NARROW_BLOCK_N)."""
    if not f32_storage and k < 32 and n >= _NARROW_BLOCK_N:
        return BLOCK_VEC
    return _block_for(n)


# probe-only escape hatch (scripts/probe_r4d.py): suppress the diagonal-
# block refinement to measure its cost on hardware. Never set in library use.
_PROBE_DISABLE_REFINE = False

# probe-only (scripts/probe_r4g_hw.py): compute the full diagonal-block
# inverses by double-float substitution against the identity
# (_df_tri_inverse) and skip the per-application refinement for those
# blocks. REJECTED on hardware (probe_r4g_hw, commit a10da35): the
# scan-based DF setup does NOT hoist out of repeated-solve loops —
# 2.7 GF/s warm at n=24576 — so the shipped routes (per-app refinement +
# the aligned-large-n Pallas-sweep reroute) stand. Never set in library
# use; retained only so the rejection stays reproducible.
_PROBE_SETUP_DF64_INV = False


def _trsv_small(a, b, uplo: str, unit: bool, st_out: str, block=None):
    """XLA-composed small-n TRSV/TRSM for the compiler-resident regime.

    Same blocked-substitution structure as the Pallas sweep, but the diagonal
    blocks are fully inverted (the leaf level collapses: a handful of big
    matvecs beats many 64-wide ones when everything is VMEM-resident, and in
    a repeated-solve loop XLA hoists the inversions — they depend only on the
    matrix). Diagonal-block inversion error is ~cond(T_bb)*eps_f32 — same
    class as the reference's in-kernel Gauss-Jordan inverses
    (cuda/trsv_kernels.cuh:125-162), checked by tests against substitution.

    `b` may be (n,) or (n, k) — the multi-rhs form turns every matvec below
    into an MXU GEMM (the small-TRSM mode)."""
    n = a.shape[0]
    vec = b.ndim == 1
    b2 = (b.reshape(n, 1) if vec else b).astype(jnp.float32)
    lower = uplo == "lower"
    f32_storage = a.dtype == jnp.float32  # before any upfront cast below
    if block is None:
        block = _small_block_for(n, b2.shape[1], f32_storage)
    nb = pl.cdiv(n, block)
    # Narrow-storage (bf16/f16) cast policy is k-dependent (probe_r3h/r3i):
    #   k < 32 (bandwidth-bound): cast PER SLICE below — XLA fuses the
    #     slice+convert into the dot-operand feed so the triangle streams
    #     once at storage width (bf16 single-rhs 692 GF/s = 84% of the
    #     storage roofline at 24576; an upfront astype would triple bytes).
    #   k >= 32 (MXU-bound): materialize ONE f32 copy upfront — the n^2
    #     cast amortizes over the panel and keeps the GEMM feeds pure
    #     (44.1 vs 38.4 TF/s bf16 at n=16384 k=128).
    #   n <= RESIDENT_N (VMEM-scale): upfront too — at tiny n the per-slice
    #     convert kernels dominate the solve (bf16 single-rhs at n=256
    #     measured 2.9 GF/s per-slice vs 44.5 upfront, trsv_flops.csv).
    if a.dtype != jnp.float32 and (b2.shape[1] >= 32 or n <= RESIDENT_N):
        a = a.astype(jnp.float32)
    # zero-copy ragged: the last block is simply smaller (every slice below
    # is static and in-bounds), replacing the former full pad + diagonal
    # scatter that dominated ragged small-n solves
    starts = [bi * block for bi in range(nb)]
    sizes = [block] * (nb - 1) + [n - (nb - 1) * block]

    def _inv_stack(ds):
        return _masked_tri_inverse(ds, lower, unit)

    nfull = nb if sizes[-1] == block else nb - 1
    inv: list = [None] * nb
    # probe_r4g_hw: df64-substitution inverses (hi = correctly rounded f32)
    # for the full diagonal blocks; their application then skips the
    # per-app refinement (see `refine` below). Ragged last block keeps the
    # f32 inverse + refinement path.
    df64_inv = bool(_PROBE_SETUP_DF64_INV) and b2.shape[1] < 32
    if nfull:
        d = jnp.stack(
            [a[s0 : s0 + block, s0 : s0 + block] for s0 in starts[:nfull]]
        ).astype(jnp.float32)
        inv_full = (_df_tri_inverse(d, lower, unit) if df64_inv
                    else _inv_stack(d))
        for bi in range(nfull):
            inv[bi] = inv_full[bi]
    if nfull != nb:
        s0 = starts[-1]
        inv[-1] = _inv_stack(a[None, s0:, s0:].astype(jnp.float32))[0]

    hi = jax.lax.Precision.HIGHEST
    # One refinement step on each diagonal-block application in the
    # bandwidth-bound regime (k < 32): x_b = inv·rhs has the INVERSE's
    # forward error (cond(T_bb)·eps), measurably worse than substitution —
    # at n=24576 the shipped inv-only route landed at 9.96e-5 vs XLA
    # TriangularSolve's 8.68e-5 (trsv_error.csv, round 3). A single
    # residual correction r = rhs - T_bb·x_b; x_b += inv·r recovers
    # substitution-class accuracy (numpy f32 model at 24576/1024-blocks:
    # inv-only 8.3e-4 → refined 1.87e-4 ≈ substitution's 1.89e-4) for two
    # extra block-resident matvecs (~8% extra diag traffic). Wide panels
    # (k >= 32, the MXU-bound TRSM route) skip it — the extra GEMMs are
    # ~12% of the MXU flops there, and the df64 tier owns accuracy.
    # Narrow storage (bf16/f16) skips it too: the storage-truncation error
    # (0.5 rel bf16 / 6e-2 f16 at 24576, trsv_error.csv) dominates the
    # diag-inverse error refinement fixes by 3+ orders of magnitude, while
    # the extra slice+convert+matvecs cost ~10% (bf16 690.6 -> 622.7 GF/s
    # at 24576 when refinement briefly applied to all storages, round 4).
    # n < 512 skips it too, on measured error AND speed (trsv_error.csv
    # round-3 inv-only vs round-4 refined): at 128/256 the inv-apply
    # solution already ties XLA TriangularSolve bit-for-bit-close
    # (2.46e-7 / 4.97e-7) and refining made it slightly WORSE at 128
    # (3.01e-7) while halving throughput (28.8 -> 16.0, 41.6 -> 33.5
    # GF/s); from 512 up refinement is throughput-free (133 -> 133 at 512)
    # and needed to beat XLA at 1024/2048 (2.04e-6 vs 2.28e-6, 3.73e-6 vs
    # 5.01e-6 — inv-only loses both).
    refine = (b2.shape[1] < 32 and f32_storage and n >= 512
              and not _PROBE_DISABLE_REFINE)
    xs: list = [None] * nb  # solved (sizes[bi], k) pieces, logical block index
    order = range(nb) if lower else range(nb - 1, -1, -1)
    for bi in order:
        rhs = b2[starts[bi] : starts[bi] + sizes[bi]]
        done = [bj for bj in (range(bi) if lower else range(bi + 1, nb))]
        if done:
            lo_c = starts[done[0]]
            hi_c = starts[done[-1]] + sizes[done[-1]]
            xcat = jnp.concatenate([xs[bj] for bj in done])
            panel = a[starts[bi] : starts[bi] + sizes[bi], lo_c:hi_c].astype(
                jnp.float32
            )
            rhs = rhs - jnp.matmul(panel, xcat, precision=hi)
        xb = jnp.matmul(inv[bi], rhs, precision=hi)
        if refine and not (df64_inv and bi < nfull):
            s0 = starts[bi]
            tb = tri_mask(
                a[s0 : s0 + sizes[bi], s0 : s0 + sizes[bi]].astype(jnp.float32),
                lower, unit,
            )
            r = rhs - jnp.matmul(tb, xb, precision=hi)
            xb = xb + jnp.matmul(inv[bi], r, precision=hi)
        xs[bi] = xb
    x = jnp.concatenate(xs).astype(dtypes.jnp_dtype(st_out))
    return x[:, 0] if vec else x


def _trsm_small_df64(a, b, uplo: str, unit: bool, st_out: str,
                     refine: bool = True, block=None):
    """Blocked-XLA df64 TRSM: the `_trsv_small` schedule with the solved
    panels and the correction carried as double-float (hi, lo) pairs in
    plain HLO (probe_r5b, round 5 — ADOPTED as the wide-panel k >= 32
    acc_trsm df64 route: 14.51/13.47 TF/s at 4096/16384 vs the fused
    sweep's 13.18/10.30, same error class, bench_results/probe_r5b.log).

    Why this exists: probe_r5a measured the fused Mosaic sweep's df64 TRSM
    time INVARIANT to rhs grouping, block size, and MXU precision mode
    (10.3 TF/s at n=16384 k=128 under every knob) — it is uniformly
    Mosaic-schedule-bound, while the fixed f32 tier rides this blocked-XLA
    schedule at 24.8 TF/s on the SAME MXU work. Carrying the DF pair
    through XLA GEMMs recovers that schedule for the df64 tier: hi-part
    products run at HIGHEST (true f32 MXU passes), lo-part products at
    default precision — the lo terms ride ~2^-24 below the hi ones, so a
    single bf16-operand pass is already under the f32 product floor — and
    cross-block accumulation folds with exact `two_sum` (df_add), matching
    the sweep's VMEM DF carry. Accuracy lands in the same f32-storage
    floor class as the one-pass sweep (probe_r5b error rows); the
    reference's analogue is its ar_type shared memory
    (cuda/trsv_kernels.cuh:546,744).

    `refine` adds one DF residual correction per diagonal block (the
    `_trsv_small` refinement with a DF residual): x_b += inv·(rhs − T_bb·x_b)
    evaluated in DF, lifting the inv-apply error back to substitution class
    for 3 extra block GEMMs (the eps^2 term inv @ r.lo is dropped —
    probe_r5d_cpu measured identical error to 4 digits at 1024-4096 on the
    benchmark LU class)."""
    n = a.shape[0]
    vec = b.ndim == 1
    b2 = (b.reshape(n, 1) if vec else b).astype(jnp.float32)
    lower = uplo == "lower"
    if block is None:
        block = _block_for(n)
    nb = pl.cdiv(n, block)
    if a.dtype != jnp.float32:
        a = a.astype(jnp.float32)
    starts = [bi * block for bi in range(nb)]
    sizes = [block] * (nb - 1) + [n - (nb - 1) * block]

    nfull = nb if sizes[-1] == block else nb - 1
    inv: list = [None] * nb
    if nfull:
        d = jnp.stack([a[s0 : s0 + block, s0 : s0 + block]
                       for s0 in starts[:nfull]])
        inv_full = _masked_tri_inverse(d, lower, unit)
        for bi in range(nfull):
            inv[bi] = inv_full[bi]
    if nfull != nb:
        s0 = starts[-1]
        inv[-1] = _masked_tri_inverse(a[None, s0:, s0:], lower, unit)[0]

    hi = jax.lax.Precision.HIGHEST
    xs_hi: list = [None] * nb
    xs_lo: list = [None] * nb
    order = range(nb) if lower else range(nb - 1, -1, -1)
    for bi in order:
        s0 = starts[bi]
        rhs = dfm.df_from(b2[s0 : s0 + sizes[bi]])
        done = [bj for bj in (range(bi) if lower else range(bi + 1, nb))]
        if done:
            lo_c = starts[done[0]]
            hi_c = starts[done[-1]] + sizes[done[-1]]
            xcat_hi = jnp.concatenate([xs_hi[bj] for bj in done])
            xcat_lo = jnp.concatenate([xs_lo[bj] for bj in done])
            panel = a[s0 : s0 + sizes[bi], lo_c:hi_c]
            th = jnp.matmul(panel, xcat_hi, precision=hi)
            tl = jnp.matmul(panel, xcat_lo)
            rhs = dfm.df_add(rhs, dfm.df_from(-th))
            rhs = dfm.df_add(rhs, dfm.df_from(-tl))
        vh = jnp.matmul(inv[bi], rhs.hi, precision=hi)
        vl = jnp.matmul(inv[bi], rhs.lo)
        xb = dfm.df_add(dfm.df_from(vh), dfm.df_from(vl))
        if refine:
            tb = tri_mask(a[s0 : s0 + sizes[bi], s0 : s0 + sizes[bi]],
                          lower, unit)
            rh = jnp.matmul(tb, xb.hi, precision=hi)
            rl = jnp.matmul(tb, xb.lo)
            r = dfm.df_sub(rhs, dfm.df_add(dfm.df_from(rh), dfm.df_from(rl)))
            # r is already O(eps)*|rhs|, so r.lo is O(eps^2) — inv @ r.lo
            # sits below the f32-storage floor. Dropping it saves 1 of the
            # 4 refine GEMMs (probe_r5d_cpu: errors identical to 4 digits
            # at 1024/1664/4096 on the benchmark LU class)
            ch = jnp.matmul(inv[bi], r.hi, precision=hi)
            xb = dfm.df_add(xb, dfm.df_from(ch))
        xs_hi[bi] = xb.hi
        xs_lo[bi] = xb.lo
    x = jnp.concatenate(xs_hi).astype(dtypes.jnp_dtype(st_out))
    return x[:, 0] if vec else x


def _block_for(n: int) -> int:
    """Sweep block size: 512 measured best at every probed n >= 1024 (even
    nb=2); below that shrink so padding stays bounded."""
    if n >= 1024:
        return BLOCK
    if n >= 512:
        return 256
    return 128


def _use_small(n: int, interpret, resident, ar: str, k: int = 1,
               st: str = "f32") -> bool:
    """Blocked-substitution routing gate: honor an explicit resident flag;
    auto only on a TPU backend with no explicit interpret request (advisor
    round-2: an explicit resident=False or interpret=True must reach the
    sweep). Auto routes f32/bf16/f16-storage single-rhs solves here —
    EXCEPT aligned f32 at n >= 8192, which rides the Pallas sweep since
    round 4 (see the reroute comment below) — (probe_r3e: blocked faster
    than the round-3 sweep below 8192 and ragged-immune; probe_r3h:
    per-slice fused convert streams bf16/f16 at
    storage width — 692/693 vs the sweep's 398/80 GF/s at 24576), any
    storage at VMEM-scale n, and wide multi-rhs panels (probe_r3g: at
    k=128 the XLA-composed schedule runs 24.9 vs 16.5 TF/s f32 and 44.5
    vs 17.9 bf16 at n=16384 — f32 k=16 measured a tie, so the f32 gate
    sits at 32; narrow storage takes the blocked route at every k since
    round 5, probe_r5p). f8 single-rhs solves route here too since round 5 (probe_r5k on
    v5e at 24576: blocked per-slice f32-cast feed 973 GF/s vs the Pallas
    sweep's 121 — the sweep is latency-class for single-rhs and fp8's byte
    saving never reached its chain; the round-3 "no fast XLA 8-bit
    slice+convert feed" claim no longer holds, and the f8 GEMM-emitter
    embed (ops/gemv.py:129-136) measured only ~4% above the plain cast
    feed, so the shared _trsv_small body stays unchanged). f8 wide panels
    and VMEM-scale solves were already here, behind an upfront f32
    materialization like bf16/f16."""
    if ar != "f32":
        return False
    if resident is True:
        return True
    if resident is False or interpret is not None:
        return False
    if jax.default_backend() != "tpu":
        return False
    # round-4 reroute (probe_r4g_hw at 24576 on v5e): aligned large-n f32
    # single-rhs solves go back to the Pallas sweep — at BLOCK_VEC=1024/
    # LEAF_VEC=256 it runs 362.6 GF/s vs the refined blocked route's 340.7
    # (the per-app diag-block refinement the blocked route needs for its
    # error costs ~8%; the sweep's 256-wide leaves keep inv-apply error at
    # the storage floor without it: 6.98e-5 vs 6.24e-5, both beating XLA's
    # 8.68e-5). Ragged/odd n stays blocked (the sweep measured 194 GF/s at
    # 12416 vs the blocked route's ragged-immune 364); below 8*BLOCK_VEC
    # the blocked route is faster (344 vs 247 at 4096, probe_r3e). The
    # threshold is written as 8*BLOCK_VEC because _trsm_impl only selects
    # the validated BLOCK_VEC/LEAF_VEC sweep schedule at n >= 8*BLOCK_VEC —
    # a retuned BLOCK_VEC must move both gates together (advisor round 4).
    if (k == 1 and st == "f32" and n >= 8 * BLOCK_VEC and n % BLOCK_VEC == 0):
        return False
    # round-5 narrow multi-rhs extension (probe_r5p at n=16384 on v5e):
    # for NARROW storage the blocked route's per-slice convert feed beats
    # the fused Pallas sweep at every probed k in (1, 32) too — bf16
    # 4510/8914 vs 2914/5699 GF/s and f8 4772/9406 vs 941/1870 at k=8/16
    # (block=1024, _small_block_for) — so the k==1 narrow gate extends to
    # k < 32. f32 storage keeps the sweep for 1 < k < 32: probe_r3g
    # measured a tie at k=16 and the convert-feed advantage is
    # narrow-specific (the f32 panel feed streams full-width either way).
    return (n <= RESIDENT_N
            or (k == 1 and st == "f32")
            or (k < 32 and st in ("bf16", "f16", "f8e4m3", "f8e5m2"))
            or k >= 32)


def _trsv_impl(a, b, uplo: str, unit: bool, interpret, st_out: str, resident=None,
               ar: str = "f32"):
    n = a.shape[0]
    if a.shape != (n, n) or b.shape != (n,):
        raise ValueError(f"trsv needs square A and matching b, got {a.shape}, {b.shape}")
    x = _trsm_impl(a, b.reshape(n, 1), uplo, unit, interpret, st_out,
                   resident=resident, ar=ar)
    return x.reshape(n)


def _trsm_impl(a, b, uplo: str, unit: bool, interpret, st_out: str, resident=None,
               ar: str = "f32"):
    """Solve T X = B for B of shape (n, k); returns X (n, k)."""
    n = a.shape[0]
    k = b.shape[1]
    if a.shape != (n, n) or b.shape[0] != n:
        raise ValueError(f"trsm needs square A and (n, k) B, got {a.shape}, {b.shape}")
    # Very wide panels at large n blow up XLA:TPU compile resources: at
    # n=16384, k=512 the blocked tiers die with RESOURCE_EXHAUSTED and a
    # standalone compile runs >15 min — the nb=32-step unrolled schedule
    # times k=512 is past the compiler's envelope, while the same shapes
    # at k=128 compile in seconds and run at 24.8 TF/s (trsm_flops.csv).
    # X's columns are independent, so chunk the rhs into the
    # measured-proven width and concatenate; n=8192 at k=512 is measured
    # working (and faster than its 128-rhs rate: 27.3 vs 22.5 TF/s), so
    # the gate starts at 16384. Revalidated on hardware (campaign_r5h,
    # trsm_rhs512.csv): every tier completes chunked, fp32 19.5 TF/s vs
    # the vendor TriangularSolve's 15.1 (which compiles un-chunked — its
    # failure in the first capture was collateral HBM pressure from the
    # preceding failed entries in the same process).
    if k > _TRSM_CHUNK_K and n >= _TRSM_CHUNK_N:
        cols = [
            _trsm_impl(a, b[:, g : g + _TRSM_CHUNK_K], uplo, unit, interpret,
                       st_out, resident=resident, ar=ar)
            for g in range(0, k, _TRSM_CHUNK_K)
        ]
        return jnp.concatenate(cols, axis=1)
    lower = uplo == "lower"
    # Wide panels at VMEM-resident n: XLA's native TriangularSolve beats
    # the blocked-inverse substitution there (trsm_flops probe: 11.8 vs
    # 10.5 TF/s at n=512, k=128; ties by n=2048) — but only for f32
    # storage: narrow storage streams half the bytes through the blocked
    # schedule's fused slice+convert and wins (15.8 vs 11.8 at 512)
    if (k >= 32 and n <= 1024 and ar == "f32"
            and dtypes.canon(a.dtype) == "f32"
            and resident is None and interpret is None
            and jax.default_backend() == "tpu"):
        # HIGHEST, like every other f32 solve in this module: without it the
        # TriangularSolve expansion truncates f32 dot operands to bf16
        with jax.default_matmul_precision("highest"):
            x = jax.lax.linalg.triangular_solve(
                a.astype(jnp.float32), b.astype(jnp.float32),
                left_side=True, lower=lower, unit_diagonal=unit,
            )
        return x.astype(dtypes.jnp_dtype(st_out))
    # XLA-composed blocked substitution (f32 arithmetic only): all
    # single-rhs solves (f8 included since round 5, probe_r5k), any
    # storage at small n, wide panels (see _use_small)
    if _use_small(n, interpret, resident, ar, k=k,
                  st=dtypes.canon(a.dtype)):
        return _trsv_small(a, b, uplo, unit, st_out)
    # round-5 reroute (probe_r5b on v5e, bench_results/probe_r5b.log): wide
    # df64 panels (k >= 32) ride the blocked-XLA schedule with DF-carried
    # panels (_trsm_small_df64). The fused Mosaic sweep is uniformly
    # schedule-bound for TRSM (probe_r5a: 10.3 TF/s at n=16384 k=128,
    # invariant to rhs grouping, block size, and MXU precision mode) while
    # this route runs 13.5/14.5 TF/s at 16384/4096 with same-class error
    # (refined 5.6e-6 vs sweep 6.6e-6 at 4096, 1.65e-5 vs 1.40e-5 at 8192 —
    # both ~2x under the f32 tier's 1.64e-5/3.19e-5). k < 32 stays on the
    # one-pass sweep (342.9 GF/s = 0.95x fixed at 24576 — the storage-speed
    # path). Explicit interpret or resident=False still reach the sweep.
    if ar == "df64" and k >= 32 and interpret is None and resident is not False:
        return _trsm_small_df64(a, b, uplo, unit, st_out)
    if interpret is None:
        interpret = interpret_default()
    # Mosaic has no f16 type: upcast f16 storage to f32 before the kernel on
    # hardware (TRSV/TRSM is the one family where the cast-outside cost is
    # acceptable — the solve is latency-, not bandwidth-, dominated), and
    # keep the kernel's out ref f32 too (an f16 out_shape dies in the same
    # Mosaic type check) — cast the solution outside the kernel.
    if not interpret and a.dtype == jnp.float16:
        a = a.astype(jnp.float32)
    if not interpret and b.dtype == jnp.float16:
        b = b.astype(jnp.float32)
    if not interpret and st_out == "f16":
        x = _trsm_impl(a, b, uplo, unit, interpret, "f32",
                       resident=resident, ar=ar)
        return x.astype(jnp.float16)
    block = _block_for(n)
    # n=4096 measured better at 512 (nb=4 at 1024 leaves too few sweep steps
    # to amortize the diagonal solves); 1024 wins from n=8192 up
    if k == 1 and n >= 8 * BLOCK_VEC:
        block = BLOCK_VEC
    # leaf choice follows the probe_r4b gate: the bigger leaf is only
    # validated (and only wins) on the single-rhs BLOCK_VEC schedule
    leaf = min(LEAF_VEC if (k == 1 and block == BLOCK_VEC) else LEAF, block)
    bt = b.T.astype(jnp.float32)  # (k, n) row-panel form
    nb = pl.cdiv(n, block)
    npad = nb * block
    # zero-copy ragged: only the rhs pads (O(n·k)); the matrix streams
    # unpadded with boundary tiles masked in-kernel (the former full-matrix
    # pad + diagonal scatter cost ~5x at every non-block-multiple n:
    # 45-65 vs 300-350 GF/s, bench_results/trsv_flops_dense.csv)
    bt_p = jnp.pad(bt, ((0, 0), (0, npad - n))) if npad != n else bt
    invt = _leaf_inverses(a, nb, block, leaf, lower, unit, interpret, n=n)

    # rhs panels padded to a sublane multiple; wide panels split into groups
    # bounded by the solved-x scratch budget (df64 carries hi+lo pairs)
    per_rhs = 4 * npad * (2 if ar == "df64" else 1)
    group = max(8, min(128, _TRSM_SCR_BYTES // per_rhs // 8 * 8))
    outs = []
    for g0 in range(0, k, group):
        gk = min(group, k - g0)
        gk_pad = max(8, -(-gk // 8) * 8) if gk > 1 else 1
        bt_g = bt_p[g0 : g0 + gk]
        if gk_pad != gk:
            bt_g = jnp.pad(bt_g, ((0, gk_pad - gk), (0, 0)))
        b2 = bt_g.reshape(gk_pad, nb, block).transpose(1, 0, 2)
        x = _trsv_sweep(
            a, invt, b2, nb, block, lower, st_out, interpret,
            leaf=leaf, nrhs=gk_pad, ar=ar, n_total=n,
        )  # (nb, gk_pad, block)
        xt = x.transpose(1, 0, 2).reshape(gk_pad, npad)
        outs.append(xt[:gk, :n])
    return jnp.concatenate(outs, 0).T  # (n, k)


def _check_bf16_envelope(a, n: int, ar: str, unstable_ok: bool, op: str):
    """The bf16-storage tier's recurrence error reaches O(1) on LU-factor
    triangles beyond ~1024 rows (trsv_error.csv: 3e-2 @1024 → 0.95 @24576).
    Warn at trace time unless the caller opted in — the tier remains useful
    as a throughput/storage demonstration and for well-conditioned or
    diagonally-dominant triangles.

    This is INHERENT to bf16 storage, not the kernel (round-4 study,
    BENCH_NOTES "Why the bf16-TRSV envelope cannot be widened"): the exact
    fp64 solve of the bf16-stored triangle already errs 0.26 at n=8192, and
    the componentwise (Skeel) condition bound governing storage rounding is
    invariant under any row/column equilibration — measured: every scaling
    variant within 5% of plain bf16 storage."""
    if unstable_ok or ar == "df64":
        return
    if dtypes.canon(a.dtype) == "bf16" and n > BF16_STABLE_N:
        warnings.warn(
            f"{op} on a bf16-storage triangle with n={n} > {BF16_STABLE_N}: "
            "the substitution recurrence amplifies the bf16 storage rounding "
            "(measured up to O(1) relative error on LU factors at n=24576). "
            "Pass unstable_ok=True to silence, or use ar='df64'/f32 storage "
            "for accuracy.",
            stacklevel=3,
        )


def trsv(a, b, uplo: str = "upper", unit: bool = True, *, interpret=None,
         resident=None, unstable_ok: bool = False):
    """Fixed-precision TRSV (reference ``trsv`` launcher,
    ``cuda/trsv_kernels.cuh:455-488``; the benchmark default is upper/unit,
    ``cuda/trsv_benchmark.cu:26-27``). A holds a full (e.g. LU-packed) matrix;
    only the selected triangle is read. `resident` selects the XLA-composed
    small-n mode (default: auto by size on TPU). bf16 storage beyond
    n=1024 warns like acc_trsv — the recurrence amplification is a property
    of the storage, not the tier."""
    _check_bf16_envelope(a, a.shape[0], "f32", unstable_ok, "trsv")
    return _trsv_impl(a, b, uplo, unit, interpret, st_out=dtypes.canon(b.dtype),
                      resident=resident)


def acc_trsv(a, b, uplo: str = "upper", unit: bool = True, ar: str = "f32", *,
             interpret=None, resident=None, unstable_ok: bool = False):
    """Accessor mixed-precision TRSV (reference ``acc_trsv``,
    ``cuda/trsv_kernels.cuh:918-961``): storage from the arrays, arithmetic per
    `ar`. ar='f32' is the MXU sweep with cast-on-load; ar='df64' carries the
    solved panels and correction accumulator as double-float VMEM pairs inside
    the one-pass sweep (the reference's arithmetic-type shared memory,
    ``cuda/trsv_kernels.cuh:546,744``) — the triangle streams exactly once, so
    the accessor tier runs at storage speed at EVERY size (the round-2
    small-n refinement form measured 10-20 GF/s at n<=2048 vs the fused
    sweep's sweep-rate ~115-170; same storage-floor error).

    bf16 storage beyond n=1024 triggers a stability warning (the recurrence
    amplifies storage rounding to O(1) on ill-conditioned triangles);
    `unstable_ok=True` opts in silently."""
    ar = dtypes.check_arithmetic(ar)
    st_out = dtypes.canon(b.dtype)
    n = a.shape[0]
    _check_bf16_envelope(a, n, ar, unstable_ok, "acc_trsv")
    if ar == "f32":
        x0 = _trsv_impl(a, b, uplo, unit, interpret, st_out="f32", resident=resident)
        return x0.astype(dtypes.jnp_dtype(st_out))
    if ar != "df64":
        raise NotImplementedError(f"acc_trsv arithmetic {ar!r}")
    if resident is True:
        raise ValueError(
            "acc_trsv ar='df64' runs the fused one-pass Pallas sweep; there "
            "is no XLA-composed resident df64 mode (resident=True unsupported)"
        )
    return _trsv_impl(a, b, uplo, unit, interpret, st_out=st_out,
                      resident=False, ar="df64")


def trsm(a, b, uplo: str = "upper", unit: bool = True, *, interpret=None,
         resident=None, unstable_ok: bool = False):
    """Fixed-precision multi-RHS triangular solve: T X = B, B of shape (n, k).

    A capability beyond the reference (its TRSV design generalized:
    ``cuda/trsv_kernels.cuh:69-235`` carries one rhs; here the solved blocks
    ride as (k, B) row-panels so every per-step dot is an MXU GEMM)."""
    _check_bf16_envelope(a, a.shape[0], "f32", unstable_ok, "trsm")
    return _trsm_impl(a, b, uplo, unit, interpret, st_out=dtypes.canon(b.dtype),
                      resident=resident)


def acc_trsm(a, b, uplo: str = "upper", unit: bool = True, ar: str = "f32", *,
             interpret=None, resident=None, unstable_ok: bool = False):
    """Accessor mixed-precision TRSM: storage from the arrays (bf16/f32),
    f32 arithmetic via cast-on-load; ar='df64' carries the solved panels as
    double-float pairs — wide panels (k >= 32) on the blocked-XLA schedule
    (_trsm_small_df64, adopted round 5 on probe_r5b hardware numbers:
    1.1-1.3x the fused sweep at 4096-16384 with same-class error), narrow
    ones on the one-pass Pallas sweep (see acc_trsv) where every right-hand
    side refines in the same single pass over the triangle. resident=True is
    rejected (no XLA-composed resident df64 mode); resident=False forces the
    sweep for every k."""
    ar = dtypes.check_arithmetic(ar)
    st_out = dtypes.canon(b.dtype)
    _check_bf16_envelope(a, a.shape[0], ar, unstable_ok, "acc_trsm")
    if ar == "f32":
        x0 = _trsm_impl(a, b, uplo, unit, interpret, st_out="f32", resident=resident)
        return x0.astype(dtypes.jnp_dtype(st_out))
    if ar != "df64":
        raise NotImplementedError(f"acc_trsm arithmetic {ar!r}")
    if resident is True:
        raise ValueError(
            "acc_trsm ar='df64' runs the fused one-pass Pallas sweep; there "
            "is no XLA-composed resident df64 mode (resident=True unsupported)"
        )
    return _trsm_impl(a, b, uplo, unit, interpret, st_out=st_out,
                      resident=resident, ar="df64")


def xla_trsv(a, b, uplo: str = "upper", unit: bool = True):
    """Vendor-baseline tier (the cublas_trsv analogue,
    ``cuda/trsv_kernels.cuh:964-1008``). Runs at HIGHEST precision like the
    other f32 vendor baselines (xla_dot/xla_gemv): the reference's cuBLAS
    fp32 tier is genuine IEEE f32, while TPU's default matmul precision
    truncates f32 operands to bf16 inside the TriangularSolve expansion."""
    with jax.default_matmul_precision("highest"):
        x = jax.lax.linalg.triangular_solve(
            a.astype(jnp.float32),
            b.astype(jnp.float32).reshape(-1, 1),
            left_side=True,
            lower=(uplo == "lower"),
            unit_diagonal=unit,
        )
    return x.reshape(-1).astype(b.dtype)


def xla_trsm(a, b, uplo: str = "upper", unit: bool = True):
    """Vendor-baseline multi-RHS tier (cublasStrsm analogue); HIGHEST
    precision — see xla_trsv."""
    with jax.default_matmul_precision("highest"):
        x = jax.lax.linalg.triangular_solve(
            a.astype(jnp.float32),
            b.astype(jnp.float32),
            left_side=True,
            lower=(uplo == "lower"),
            unit_diagonal=unit,
        )
    return x.astype(b.dtype)
