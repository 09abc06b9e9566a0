"""TPU probe: zero-copy ragged DOT via 1-D Pallas blocks (VERDICT #5, DOT half).

A ragged (n % 128 != 0) vector cannot be reshaped to (rows, 128) without a
pad copy — the round-2 cost. If Mosaic accepts 1-D BlockSpecs with an
in-kernel (bl,) -> (bl/128, 128) reshape at native layout cost, the kernel
can stream the original buffer and mask the OOB tail of the last block.

Measures: correctness vs fp64, GF/s at n = 2^27 (aligned) and 2^27 + 17
(ragged) for the 1-D form, vs the production acc_dot (which pads when
ragged) at both sizes.
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from accblas_tpu.ops import dot as dotops
from accblas_tpu.ops.common import compiler_params
from accblas_tpu.utils.bench import benchmark_loop

BL = 2048 * 128


def _kernel(init_ref, x_ref, y_ref, o_ref, acc, *, n: int, n_steps: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        rid = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 0)
        cid = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
        acc[...] = jnp.where((rid == 0) & (cid == 0), init_ref[0, 0], 0.0)

    xv = x_ref[...].reshape(-1, 128)
    yv = y_ref[...].reshape(-1, 128)
    p = xv * yv
    if n % BL:
        base = i * BL
        rid = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
        cid = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
        gid = rid * 128 + cid
        p = jnp.where(gid < n - base, p, 0.0)
    pr = p.reshape(-1, 8, 128)
    while pr.shape[0] > 1:
        half = pr.shape[0] // 2
        pr = pr[:half] + pr[half:]
    acc[...] = acc[...] + pr[0]

    @pl.when(i == n_steps - 1)
    def _fin():
        o_ref[0, 0] = jnp.sum(acc[...])


def dot1d(init, x, y):
    n = x.shape[0]
    n_steps = pl.cdiv(n, BL)
    return pl.pallas_call(
        functools.partial(_kernel, n=n, n_steps=n_steps),
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((BL,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((BL,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        compiler_params=compiler_params(
            dimension_semantics=("arbitrary",), vmem_limit_bytes=64 * 2**20
        ),
    )(init, x, y)[0, 0]


def main():
    print("devices:", jax.devices(), flush=True)
    for n in ((1 << 27), (1 << 27) + 17):
        kx, ky = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.uniform(kx, (n,), jnp.float32, -1, 1)
        y = jax.random.uniform(ky, (n,), jnp.float32, -1, 1)
        jax.block_until_ready((x, y))
        flops = 2.0 * n

        # correctness on a small prefix against fp64
        ns = 4096 + (n % 128)
        xs, ys = x[:ns], y[:ns]
        ref = np.asarray(xs, np.float64) @ np.asarray(ys, np.float64)
        got = float(jax.jit(dot1d)(jnp.zeros((1, 1), jnp.float32), xs, ys))
        print(f"n={ns} 1-D kernel rel err {abs(got-ref)/abs(ref):.2e}", flush=True)

        def body_1d(c, x, y):
            return dot1d(c.reshape(1, 1) * 1e-30, x, y).reshape(1)

        def body_prod(c, x, y):
            return dotops.dot(x, y, init=c[0] * 1e-30, resident=False).reshape(1)

        c0 = jnp.zeros((1,), jnp.float32)
        try:
            ms = benchmark_loop(body_1d, c0, args=(x, y))
            print(f"n={n} 1-D kernel   {flops/(ms*1e-3)/1e9:7.1f} GF/s", flush=True)
        except Exception as e:
            print(f"n={n} 1-D kernel FAILED: {type(e).__name__}: {str(e)[:400]}",
                  flush=True)
        ms = benchmark_loop(body_prod, c0, args=(x, y))
        print(f"n={n} production   {flops/(ms*1e-3)/1e9:7.1f} GF/s", flush=True)
        del x, y


if __name__ == "__main__":
    main()
