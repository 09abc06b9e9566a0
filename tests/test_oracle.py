"""Device-side df64 oracle tests (ops.oracle) — the cuBLAS-fp64 analogue.

The oracle's role (reference ``cuda/utils.cuh:315-332``, cuBLAS fp64 line in
``plots/a100_dot_error_median_u-1,1.svg``): an independent on-device
implementation far below every measured tier, certifying host and device
agree. These tests pin its accuracy floor at the df64 level.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.linalg

from accblas_tpu.ops import df64 as dfm
from accblas_tpu.ops import oracle
from accblas_tpu.utils import MatrixInfo, devgen, gen_mtx


def test_oracle_dot_at_df64_floor():
    n = 8192
    xh, xl = devgen.split_df64(None, master_shape=(n,), seed=42, role="dot_x")
    yh, yl = devgen.split_df64(None, master_shape=(n,), seed=42, role="dot_y")
    ref = devgen.master_f64((n,), 42, "dot_x") @ devgen.master_f64((n,), 42, "dot_y")
    got = float(dfm.df_to_f64(oracle.dot_df64(xh, xl, yh, yl)))
    rel = abs(got - ref) / abs(ref)
    assert rel < 1e-12  # ~2^-48 plus cancellation; far below the 1e-7 tiers


def test_oracle_gemv_at_df64_floor():
    m, n = 192, 2048
    ah, al = devgen.split_df64(None, master_shape=(m, n), seed=42, role="gemv_a")
    xh, xl = devgen.split_df64(None, master_shape=(n,), seed=42, role="gemv_x")
    a64 = devgen.master_f64((m, n), 42, "gemv_a")
    x64 = devgen.master_f64((n,), 42, "gemv_x")
    g = oracle.gemv_df64(ah, al, xh, xl, block=64)
    g64 = np.asarray(g.hi, np.float64) + np.asarray(g.lo, np.float64)
    ref = a64 @ x64
    assert np.max(np.abs(g64 - ref)) / np.max(np.abs(ref)) < 1e-12


@pytest.mark.parametrize("uplo", ["upper", "lower"])
def test_oracle_trsv_refines_to_df64(uplo):
    n = 512
    a64 = gen_mtx(MatrixInfo(n, n), seed=42)
    lu64, _ = scipy.linalg.lu_factor(a64)
    b64 = gen_mtx(MatrixInfo(1, n), seed=43)[0]
    t = np.triu(lu64) if uplo == "upper" else np.tril(lu64)
    ref = scipy.linalg.solve_triangular(t, b64, lower=(uplo == "lower"))
    th = t.astype(np.float32)
    tl = (t - th.astype(np.float64)).astype(np.float32)
    bh = b64.astype(np.float32)
    bl = (b64 - bh.astype(np.float64)).astype(np.float32)
    x = oracle.trsv_df64(
        jnp.asarray(th), jnp.asarray(tl), jnp.asarray(bh), jnp.asarray(bl),
        uplo, False,
    )
    x64 = np.asarray(x.hi, np.float64) + np.asarray(x.lo, np.float64)
    rel = np.max(np.abs(x64 - ref)) / np.max(np.abs(ref))
    assert rel < 1e-11  # κ(T)·2^-48; orders below the f32 tier's ~1e-5
