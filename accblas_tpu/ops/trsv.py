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
- **Phase 2 (Pallas sweep)**: a 2-D (block-row i, block-column j) grid whose
  sequential iteration order *is* the dependency order — the ticket +
  spin-lock + threadfence protocol is simply grid order on a TPU core. The
  solved prefix of x lives in a VMEM scratch carried across steps (the
  published-x global array analogue), corrections accumulate per block-row,
  and the diagonal step applies the pre-inverted block via the MXU.
  Steps in the empty triangle (j > i for lower) remap their A-block index to
  the diagonal block — Pallas skips DMA when consecutive steps map to the
  same block, so the dead half of the grid costs no bandwidth.

The accessor tier (``acc_trsv``, reference ``cuda/trsv_kernels.cuh:918-961``)
decouples storage (bf16/f32) from arithmetic: cast-on-load feeds the f32 MXU
path; ar='df64' adds one step of mixed-precision iterative refinement (the
TPU-idiomatic equivalent of running the recurrence in fp64 registers — the
residual is computed with df64-exact dot products via ``tri_gemv``).

``cublas_trsv`` (``cuda/trsv_kernels.cuh:964-1008``) maps to `xla_trsv`
(XLA's native TriangularSolve, which reads the wanted triangle of a full
matrix exactly like cuBLAS).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accessor import dtypes
from .common import compiler_params, interpret_default

# block size: balances per-step overhead against DMA granularity (measured on
# v5e at n=16384: 512 -> 278 GFLOP/s vs 256 -> 186)
BLOCK = 512
# leaf size for the two-level diagonal solve: only leaf x leaf diagonal
# sub-blocks are inverted in phase 1 (B/leaf fewer flops than inverting the
# full diagonal block: 33 Mflop vs 2.1 Gflop at n=16384), and the kernel
# substitutes through the diagonal block with leaf-granular MXU dots
LEAF = 64


def _extract_leaf_diag(a, nb: int, block: int, leaf: int, interpret):
    """Extract the leaf-diagonal blocks as (nb·B/leaf, leaf, leaf).

    Two stages: a Pallas DMA pulls exactly the nb block-diagonal (B, B) tiles
    (an XLA gather over the full n² matrix lowers catastrophically — measured
    ~10 ms at n=16384 vs ~0.04 ms of actual bytes), then a cheap gather on
    that small stack selects the leaf diagonals."""

    def kern(a_ref, o_ref):
        o_ref[0] = a_ref[...]

    dd = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[pl.BlockSpec((block, block), lambda i: (i, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (1, block, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nb, block, block), a.dtype),
        compiler_params=compiler_params(dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(a)
    nleaf = block // leaf
    d5 = dd.reshape(nb, nleaf, leaf, nleaf, leaf)
    idx = jnp.arange(nleaf)
    d = d5[:, idx, :, idx, :]  # (nleaf, nb, leaf, leaf)
    return d.transpose(1, 0, 2, 3).reshape(nb * nleaf, leaf, leaf)


def _leaf_inverses(a, nb: int, block: int, leaf: int, lower: bool, unit: bool, interpret):
    """Batched masked inversion of the leaf x leaf diagonal sub-blocks,
    transposed for the row-form sweep (phase 1 — the Gauss-Jordan-in-shared-
    memory role, ``cuda/trsv_kernels.cuh:125-162``, hoisted out of the
    sequential sweep and batched). Returns (nb, B/leaf, leaf, leaf) float32."""
    m = nb * block // leaf
    d = _extract_leaf_diag(a, nb, block, leaf, interpret).astype(jnp.float32)  # (m, leaf, leaf)
    r = jax.lax.broadcasted_iota(jnp.int32, (leaf, leaf), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (leaf, leaf), 1)
    tri = (r >= c) if lower else (r <= c)
    d = jnp.where(tri[None], d, 0.0)
    if unit:
        d = jnp.where((r == c)[None], 1.0, d)
    eye = jnp.broadcast_to(jnp.eye(leaf, dtype=jnp.float32), (m, leaf, leaf))
    # TPU's default matmul precision truncates f32 operands to bf16 inside
    # XLA's blocked TriangularSolve — force true f32 (Pallas/Mosaic dots in
    # the sweep are f32 regardless; this phase must match)
    with jax.default_matmul_precision("highest"):
        inv = jax.lax.linalg.triangular_solve(
            d, eye, left_side=True, lower=lower, unit_diagonal=False
        )
    return inv.transpose(0, 2, 1).reshape(nb, block // leaf, leaf, leaf)


def _trsv_kernel(
    a_ref,
    invt_ref,
    b_ref,
    x_out_ref,
    x_scr,
    corr,
    *,
    nb: int,
    lower: bool,
    st_out: str,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    # logical block coordinates (reversed sweep for upper triangles —
    # reference upper_trsv walks from the bottom-right, cuda/trsv_kernels.cuh:306-309)
    bj_eff = jnp.minimum(j, i)  # clamp: dead steps alias the diagonal block
    bi = i if lower else nb - 1 - i
    bj = bj_eff if lower else nb - 1 - bj_eff

    @pl.when(j == 0)
    def _reset():
        corr[...] = jnp.zeros_like(corr)

    a_blk = a_ref[...].astype(jnp.float32)  # cast-on-load (accessor semantics)

    @pl.when(j < i)
    def _update():
        # correction += x[bj] · A(bi, bj)^T  — the "consume published block
        # columns" step (cuda/trsv_kernels.cuh:184-199), MXU rhs-transposed dot
        x_row = x_scr[pl.ds(bj, 1), :]  # (1, B) solved block
        corr[...] = corr[...] + jax.lax.dot_general(
            x_row,
            a_blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    @pl.when(j == i)
    def _solve():
        # two-level diagonal solve (the inv(L_diag)·(rhs - corr) step,
        # cuda/trsv_kernels.cuh:212-228): substitute through the diagonal
        # block at leaf granularity using the pre-inverted leaf blocks —
        # the a_blk slices are static, the dots ride the MXU
        rhs = b_ref[0].astype(jnp.float32) - corr[...]
        nleaf = a_blk.shape[0] // LEAF
        order = range(nleaf) if lower else range(nleaf - 1, -1, -1)
        xs = [None] * nleaf
        for s in order:
            r_s = rhs[:, s * LEAF : (s + 1) * LEAF]
            deps = range(s) if lower else range(s + 1, nleaf)
            for t2 in deps:
                d_st = a_blk[s * LEAF : (s + 1) * LEAF, t2 * LEAF : (t2 + 1) * LEAF]
                r_s = r_s - jax.lax.dot_general(
                    xs[t2],
                    d_st,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            xs[s] = jax.lax.dot_general(
                r_s,
                invt_ref[0, s],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        x_row = jnp.concatenate(xs, axis=1)
        x_scr[pl.ds(bi, 1), :] = x_row  # publish (threadfence+flag analogue)
        x_out_ref[0] = x_row.astype(dtypes.jnp_dtype(st_out))


def _trsv_sweep(a, invt, b2, nb: int, block: int, lower: bool, st_out: str, interpret):
    def a_index(i, j):
        bj_eff = jnp.minimum(j, i)
        if lower:
            return (i, bj_eff)
        return (nb - 1 - i, nb - 1 - bj_eff)

    def row_index(i, j):
        return (i, 0) if lower else (nb - 1 - i, 0)

    kernel = functools.partial(
        _trsv_kernel, nb=nb, lower=lower, st_out=st_out
    )
    out = pl.pallas_call(
        kernel,
        grid=(nb, nb),
        in_specs=[
            pl.BlockSpec((block, block), a_index, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, block // LEAF, LEAF, LEAF),
                lambda i, j: (row_index(i, j)[0], 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # rows ride as (nb, 1, block): Mosaic requires the last two block
            # dims be 8/128-divisible or equal to the array dims
            pl.BlockSpec((1, 1, block), lambda i, j: (row_index(i, j)[0], 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block), lambda i, j: (row_index(i, j)[0], 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 1, block), dtypes.jnp_dtype(st_out)),
        scratch_shapes=[
            pltpu.VMEM((nb, block), jnp.float32),  # solved x (whole vector)
            pltpu.VMEM((1, block), jnp.float32),  # correction accumulator
        ],
        compiler_params=compiler_params(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=nb * (nb + 1) * block * block,
            bytes_accessed=(nb * (nb + 1) // 2) * block * block * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, invt, b2.reshape(nb, 1, block))
    return out.reshape(nb, block)


def _pad_packed(a, b, block: int):
    """Pad the LU-packed matrix to a block multiple with an identity diagonal
    (padding rows solve to x = 0 for zero-padded b)."""
    n = a.shape[0]
    nb = pl.cdiv(n, block)
    npad = nb * block
    if npad != n:
        a = jnp.pad(a, ((0, npad - n), (0, npad - n)))
        pad_idx = jnp.arange(n, npad)
        a = a.at[pad_idx, pad_idx].set(1.0)
        b = jnp.pad(b, (0, npad - n))
    return a, b, nb, npad


def _trsv_impl(a, b, uplo: str, unit: bool, interpret, st_out: str):
    n = a.shape[0]
    if a.shape != (n, n) or b.shape != (n,):
        raise ValueError(f"trsv needs square A and matching b, got {a.shape}, {b.shape}")
    lower = uplo == "lower"
    if interpret is None:
        interpret = interpret_default()
    a_p, b_p, nb, npad = _pad_packed(a, b, BLOCK)
    invt = _leaf_inverses(a_p, nb, BLOCK, LEAF, lower, unit, interpret)
    x = _trsv_sweep(
        a_p, invt, b_p.reshape(nb, BLOCK), nb, BLOCK, lower, st_out, interpret
    )
    return x.reshape(npad)[:n]


def trsv(a, b, uplo: str = "upper", unit: bool = True, *, interpret=None):
    """Fixed-precision TRSV (reference ``trsv`` launcher,
    ``cuda/trsv_kernels.cuh:455-488``; the benchmark default is upper/unit,
    ``cuda/trsv_benchmark.cu:26-27``). A holds a full (e.g. LU-packed) matrix;
    only the selected triangle is read."""
    return _trsv_impl(a, b, uplo, unit, interpret, st_out=dtypes.canon(b.dtype))


def acc_trsv(a, b, uplo: str = "upper", unit: bool = True, ar: str = "f32", *, interpret=None):
    """Accessor mixed-precision TRSV (reference ``acc_trsv``,
    ``cuda/trsv_kernels.cuh:918-961``): storage from the arrays, arithmetic per
    `ar`. ar='f32' is the MXU sweep with cast-on-load; ar='df64' adds one
    iterative-refinement step with a df64-exact residual (the fp64-register
    recurrence analogue)."""
    ar = dtypes.canon(ar)
    st_out = dtypes.canon(b.dtype)
    x0 = _trsv_impl(a, b, uplo, unit, interpret, st_out="f32")
    if ar == "f32":
        return x0.astype(dtypes.jnp_dtype(st_out))
    if ar != "df64":
        raise NotImplementedError(f"acc_trsv arithmetic {ar!r}")
    # one refinement step: r = b - T x0 (df64-exact residual), dx = T^{-1} r
    from .tri_gemv import tri_gemv_df64

    r = tri_gemv_df64(a, x0, b, uplo=uplo, unit=unit, interpret=interpret)
    dx = _trsv_impl(a, r, uplo, unit, interpret, st_out="f32")
    return (x0 + dx).astype(dtypes.jnp_dtype(st_out))


def xla_trsv(a, b, uplo: str = "upper", unit: bool = True):
    """Vendor-baseline tier (the cublas_trsv analogue,
    ``cuda/trsv_kernels.cuh:964-1008``)."""
    x = jax.lax.linalg.triangular_solve(
        a.astype(jnp.float32),
        b.astype(jnp.float32).reshape(-1, 1),
        left_side=True,
        lower=(uplo == "lower"),
        unit_diagonal=unit,
    )
    return x.reshape(-1).astype(b.dtype)
