"""The accessor's core promise: a kernel written ONCE against ranges runs at
any storage/arithmetic pairing (reference README.md:26-28,44-56 — the
side-by-side 'fewer parameters, same kernel' showcase).

Here a user-defined AXPY-like Pallas kernel is written generically over
Ranges; the same body executes with f32, bf16-storage/f32-arith, and
f32-storage/df64-arith, without modification.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from accblas_tpu import Range, ReducedRowMajor
from accblas_tpu.ops.common import interpret_default
from accblas_tpu.utils import MatrixInfo, gen_mtx


def generic_axpy_kernel(x_ref, y_ref, o_ref, *, spec_x, spec_y, spec_o, alpha):
    # written once against ranges: loads cast to the arithmetic type, the
    # arithmetic dispatches on the value kind (jnp array or DF), the store
    # casts back to the output's storage type
    x = Range(spec_x, x_ref, const=True)
    y = Range(spec_y, y_ref, const=True)
    o = Range(spec_o, o_ref)
    o.store(x.load() * alpha + y.load())


def axpy(x, y, ar, out_st, alpha=2.0):
    import functools

    spec_x = ReducedRowMajor(ar, str(x.dtype))
    spec_y = ReducedRowMajor(ar, str(y.dtype))
    spec_o = ReducedRowMajor(ar, out_st)
    from accblas_tpu.accessor import dtypes

    return pl.pallas_call(
        functools.partial(
            generic_axpy_kernel,
            spec_x=spec_x,
            spec_y=spec_y,
            spec_o=spec_o,
            alpha=alpha,
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, dtypes.jnp_dtype(out_st)),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret_default(),
    )(x, y)


def _reduce_last(v):
    """Pairwise halving over the last axis using only + and slicing — works
    unchanged for jnp arrays and DF values (operator dispatch), so the GEMV
    body below stays tier-generic."""
    w = v.shape[-1]
    while w > 1:
        w //= 2
        v = v[..., :w] + v[..., w : 2 * w]
    return v


def generic_gemv_kernel(a_ref, x_ref, r_ref, o_ref, *, spec_a, spec_x, spec_r,
                        spec_o, alpha, beta):
    # res = alpha * A @ x + beta * res, written ONCE against ranges — the
    # reference's acc_gemv property (cuda/gemv_kernels.cuh:79-113): the same
    # body runs with f32, bf16-storage/f32-arith, and f32-storage/df64-arith
    # (DF values flow through *, +, and the pairwise fold by overloading).
    a = Range(spec_a, a_ref, const=True)
    x = Range(spec_x, x_ref, const=True)
    r = Range(spec_r, r_ref, const=True)
    o = Range(spec_o, o_ref)
    prod = a.load() * x.load()  # (m, n) in the arithmetic type
    val = _reduce_last(prod)  # (m, 1)
    o.store(val * alpha + r.load() * beta)


def gemv_generic(a, x, r, ar, out_st, alpha=1.5, beta=-0.5):
    import functools

    from accblas_tpu.accessor import dtypes

    m, n = a.shape
    return pl.pallas_call(
        functools.partial(
            generic_gemv_kernel,
            spec_a=ReducedRowMajor(ar, str(a.dtype)),
            spec_x=ReducedRowMajor(ar, str(x.dtype)),
            spec_r=ReducedRowMajor(ar, str(r.dtype)),
            spec_o=ReducedRowMajor(ar, out_st),
            alpha=alpha,
            beta=beta,
        ),
        out_shape=jax.ShapeDtypeStruct((m, 1), dtypes.jnp_dtype(out_st)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret_default(),
    )(a, x.reshape(1, n), r.reshape(m, 1))


def test_generic_gemv_three_tiers():
    m, n = 64, 256
    a64 = gen_mtx(MatrixInfo(m, n), seed=5)
    x64 = gen_mtx(MatrixInfo(1, n), seed=6)[0]
    r64 = gen_mtx(MatrixInfo(1, m), seed=7)[0]
    ref = (1.5 * a64 @ x64 - 0.5 * r64).reshape(m, 1)

    a32 = jnp.asarray(a64, jnp.float32)
    x32 = jnp.asarray(x64, jnp.float32)
    r32 = jnp.asarray(r64, jnp.float32)

    # tier 1: plain f32
    out = gemv_generic(a32, x32, r32, "f32", "f32")
    np.testing.assert_allclose(np.asarray(out, np.float64), ref, rtol=2e-5, atol=2e-5)

    # tier 2: bf16 storage, f32 arithmetic — same body
    out = gemv_generic(
        a32.astype(jnp.bfloat16), x32.astype(jnp.bfloat16), r32, "f32", "f32"
    )
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out, np.float64), ref, rtol=5e-2, atol=5e-2)

    # tier 3: f32 storage, df64 arithmetic — same body, DF values throughout
    out = gemv_generic(a32, x32, r32, "df64", "f32")
    np.testing.assert_allclose(np.asarray(out, np.float64), ref, rtol=2e-6, atol=2e-6)


def test_same_kernel_three_tiers():
    m = gen_mtx(MatrixInfo(64, 256), seed=1)
    v = gen_mtx(MatrixInfo(64, 256), seed=2)
    ref = 2.0 * m + v

    x32 = jnp.asarray(m, jnp.float32)
    y32 = jnp.asarray(v, jnp.float32)

    # tier 1: plain f32
    out = axpy(x32, y32, "f32", "f32")
    np.testing.assert_allclose(np.asarray(out, np.float64), ref, rtol=1e-6, atol=1e-6)

    # tier 2: bf16 storage, f32 arithmetic — same kernel body
    xb, yb = x32.astype(jnp.bfloat16), y32.astype(jnp.bfloat16)
    out = axpy(xb, yb, "f32", "f32")
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out, np.float64), ref, rtol=2e-2, atol=3e-2)

    # tier 3: f32 storage, df64 arithmetic — same kernel body, DF values
    out = axpy(x32, y32, "df64", "f32")
    np.testing.assert_allclose(np.asarray(out, np.float64), ref, rtol=1e-6, atol=1e-6)
