"""Device-side high-precision oracle — the cuBLAS-fp64 cross-check analogue.

The reference's error plots include a cuBLAS fp64 line at ~1e-14
(``cuda/utils.cuh:315-332``; legend of ``plots/a100_dot_error_median_u-1,1.svg``):
an *independent on-device implementation* whose agreement with the fp64 host
reference certifies that neither side is systematically wrong. On TPU there is
no native fp64, so the oracle runs df64 arithmetic over an exact two-word
(hi, lo) f32 split of the fp64 master data (utils.devgen.split_df64 /
host-side split of an LU-factored matrix):

    x·y = (xh+xl)·(yh+yl) = xh·yh [exact two_prod] + xh·yl + xl·yh [f32
    products, O(2^-24) of O(2^-24) terms -> O(2^-48) rounding] + xl·yl
    [O(2^-48), dropped for DOT/GEMV — below the df64 floor]

giving ~2^-48 ≈ 4e-15 arithmetic error — the same "far below every measured
tier" role the cuBLAS fp64 column plays. Error-mode drivers emit this as the
``df64 oracle (device)`` column.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from . import df64 as dfm
from . import dot as dotops
from . import trsv as trsvops


def dot_df64(xh, xl, yh, yl) -> dfm.DF:
    """df64 DOT over split-f64 storage: three Pallas accessor dots combined.

    The main term runs the precise (exact two_prod) df64 kernel; the cross
    terms are ~2^-24 relative, so their fast-mode f32 product rounding lands
    at ~2^-48 overall — the df64 floor either way.
    """
    main = dotops.acc_dot(xh, yh, ar="df64", precise=True)
    c1 = dotops.acc_dot(xh, yl, ar="df64")
    c2 = dotops.acc_dot(xl, yh, ar="df64")
    return dfm.df_add(dfm.df_add(main, c1), c2)


@functools.partial(jax.jit, static_argnames=("n",))
def _gemv_block_df64(ah, al, xh, xl, n: int):
    """df64 matvec of one row block over split storage (jnp, error-mode only).

    Exact two_prod on the main term; cross terms ride the error channel of a
    two_sum halving tree over columns.
    """
    p, e = dfm.two_prod(ah, xh[None, :])
    err = e + ah * xl[None, :] + al * xh[None, :] + al * xl[None, :]
    s = p
    while s.shape[1] > 1:
        half = s.shape[1] // 2
        s_new, e2 = dfm.two_sum(s[:, :half], s[:, half : 2 * half])
        err_new = err[:, :half] + err[:, half : 2 * half] + e2
        if s.shape[1] % 2:
            s0, e0 = dfm.two_sum(s_new[:, :1], s[:, 2 * half :])
            err_new = jnp.concatenate(
                [err_new[:, :1] + e0 + err[:, 2 * half :], err_new[:, 1:]], 1
            )
            s_new = jnp.concatenate([s0, s_new[:, 1:]], 1)
        s, err = s_new, err_new
    return s[:, 0], err[:, 0]


def gemv_df64(ah, al, xh, xl, block: int = 2048) -> dfm.DF:
    """df64 GEMV over split-f64 storage, row-blocked (oracle path, unjitted
    host loop — error mode runs once per size, throughput is irrelevant)."""
    m, n = ah.shape
    his, los = [], []
    for i0 in range(0, m, block):
        i1 = min(i0 + block, m)
        hi, lo = _gemv_block_df64(ah[i0:i1], al[i0:i1], xh, xl, n)
        his.append(hi)
        los.append(lo)
    return dfm.DF(jnp.concatenate(his), jnp.concatenate(los))


def trsv_df64(ah, al, bh, bl, uplo: str = "upper", unit: bool = True,
              iters: int = 3) -> dfm.DF:
    """df64 triangular solve via iterative refinement over split-f64 storage.

    (ah, al) must be the split of the *solved triangle itself* — masked to
    `uplo`, with a materialized unit diagonal when `unit` — because the
    refinement residual streams the whole carrier through the oracle GEMV
    (the off-triangle half of an LU-factor carrier would poison it).

    f32 base solve + `iters` rounds of (df64 residual through the split
    triangle, f32 correction solve). Each round contracts the error by
    ~eps_f32·κ(T); three rounds reach the df64 floor for well-conditioned
    triangles (e.g. the non-unit LU-factor triangles the error driver uses).
    The residual matvec is the oracle GEMV above, so the refined solution is
    accurate to ~2^-48 — the device-side stand-in for cuBLAS fp64 TRSV.
    """
    x = trsvops.trsv(ah, bh, uplo=uplo, unit=unit)
    x_df = dfm.df_from(x)
    for _ in range(iters):
        ax = gemv_df64(ah, al, x_df.hi, x_df.lo)
        r = dfm.df_sub(dfm.DF(bh, bl), ax)
        dx = trsvops.trsv(ah, r.hi + r.lo, uplo=uplo, unit=unit)
        x_df = dfm.df_add(x_df, dfm.df_from(dx))
    return x_df
