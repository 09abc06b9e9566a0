"""Triangular residual kernel: r = b - T @ x with df64 cross-block
accumulation.

Support kernel for acc_trsv's mixed-precision refinement (ops.trsv): T is the
selected triangle of a full (LU-packed) matrix, exactly the operand the TRSV
sweep reads, so the residual costs one extra pass over the same n^2/2 bytes.
Same 2-D grid + dead-step-aliasing trick as the TRSV sweep; per-block products
use the f32 MXU, and block partials accumulate across the column grid in a
double-float (hi, lo) scratch pair so cross-block cancellation does not lose
the low bits the refinement step needs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import df64 as dfm
from .common import compiler_params, interpret_default, tri_mask
from .trsv import BLOCK, _pad_packed


def _tri_gemv_kernel(
    a_ref,
    x_ref,
    b_ref,
    r_ref,
    acc_hi,
    acc_lo,
    *,
    nb: int,
    block: int,
    lower: bool,
    unit: bool,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    bj_eff = jnp.minimum(j, i)
    bi = i if lower else nb - 1 - i

    @pl.when(j == 0)
    def _reset():
        acc_hi[...] = jnp.zeros_like(acc_hi)
        acc_lo[...] = jnp.zeros_like(acc_lo)

    a_blk = a_ref[...].astype(jnp.float32)

    def accumulate(blk, x_row):
        t = jax.lax.dot_general(
            x_row,
            blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        acc = dfm.df_add(dfm.DF(acc_hi[...], acc_lo[...]), dfm.df_from(t))
        acc_hi[...] = acc.hi
        acc_lo[...] = acc.lo

    @pl.when(j < i)
    def _offdiag():
        accumulate(a_blk, x_ref[pl.ds(bj_eff if lower else nb - 1 - bj_eff, 1), :])

    @pl.when(j == i)
    def _diag_and_emit():
        d = tri_mask(a_blk, lower, unit)
        accumulate(d, x_ref[pl.ds(bi, 1), :])
        res = dfm.df_sub(
            dfm.df_from(b_ref[0].astype(jnp.float32)),
            dfm.DF(acc_hi[...], acc_lo[...]),
        )
        r_ref[0] = dfm.df_to_f32(res)


def tri_gemv_df64(a, x, b, uplo: str = "upper", unit: bool = True, *, interpret=None):
    """r = b - T x, T = selected triangle of `a`; f32 result with df64-carried
    cross-block accumulation."""
    n = a.shape[0]
    lower = uplo == "lower"
    if interpret is None:
        interpret = interpret_default()
    a_p, b_p, nb, npad = _pad_packed(a, b.astype(jnp.float32), BLOCK)
    x_p = jnp.pad(x.astype(jnp.float32), (0, npad - n)) if npad != n else x.astype(jnp.float32)

    def row_index(i, j):
        return (i, 0) if lower else (nb - 1 - i, 0)

    def a_index(i, j):
        bj_eff = jnp.minimum(j, i)
        if lower:
            return (i, bj_eff)
        return (nb - 1 - i, nb - 1 - bj_eff)

    kernel = functools.partial(
        _tri_gemv_kernel, nb=nb, block=BLOCK, lower=lower, unit=unit
    )
    out = pl.pallas_call(
        kernel,
        grid=(nb, nb),
        in_specs=[
            pl.BlockSpec((BLOCK, BLOCK), a_index, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x: full (nb, B)
            pl.BlockSpec((1, 1, BLOCK), lambda i, j: (row_index(i, j)[0], 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, BLOCK), lambda i, j: (row_index(i, j)[0], 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, BLOCK), jnp.float32),
            pltpu.VMEM((1, BLOCK), jnp.float32),
        ],
        compiler_params=compiler_params(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        interpret=interpret,
    )(a_p, x_p.reshape(nb, BLOCK), b_p.reshape(nb, 1, BLOCK))
    return out.reshape(npad)[:n]
