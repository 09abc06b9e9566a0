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
