"""Probe r3l: GEMV-f8 embed width — push past 82% of the f8 roofline.

The f8 tier embeds x as column 0 of an (n, kcols) zero block so XLA's f8
GEMM emitter (not its matvec emitter) streams A: kcols=8 measured 1356
GF/s at 24576² (probe_r3b), 82% of the 1638 GF/s storage roofline. GEMM
efficiency usually rises with the free dimension — sweep kcols and also
try a bf16 x-block (mixed f8xbf16 feeds) to find the emitter's ceiling.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_r3l.py
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from accblas_tpu.utils.bench import benchmark_loop

print("devices:", jax.devices(), flush=True)

N = 24576
rng = np.random.default_rng(42)
a32 = jnp.asarray(rng.uniform(-1, 1, (N, N)), jnp.float32)
a8 = jax.jit(lambda v: v.astype(jnp.float8_e4m3fn))(a32)
x32 = jnp.asarray(rng.uniform(-1, 1, N), jnp.float32)
x8 = jax.jit(lambda v: v.astype(jnp.float8_e4m3fn))(x32)
del a32
jax.block_until_ready((a8, x8))

flops = 2.0 * N * N


def embed(av, xv, kcols, xdt):
    x2 = jnp.zeros((xv.shape[0], kcols), xdt).at[:, 0].set(xv.astype(xdt))
    return jnp.matmul(av, x2, preferred_element_type=jnp.float32)[:, 0]


ref = None
for xdt, xname in ((jnp.float8_e4m3fn, "f8"), (jnp.bfloat16, "bf16")):
    for kcols in (8, 16, 32, 64, 128):
        fn = functools.partial(embed, kcols=kcols, xdt=xdt)

        def body(c, a_, x_):
            # driver idiom: carry a data dependence through the x operand
            xc = x_.at[0].add((c[0].astype(jnp.float32) * 1e-30).astype(x_.dtype))
            return fn(a_, xc)

        ms = benchmark_loop(body, jnp.ones((N,), jnp.float32), args=(a8, x8))
        got = np.asarray(fn(a8, x8), np.float64)
        if ref is None:
            ref = got
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        print(f"x={xname} kcols={kcols}: {flops/(ms*1e-3)/1e9:7.1f} GF/s"
              f"  rel-vs-k8 {rel:.2e}", flush=True)

# matvec emitter baseline for reference
def mv(c, a_, x_):
    xc = x_.at[0].add((c[0].astype(jnp.float32) * 1e-30).astype(x_.dtype))
    return jnp.matmul(a_, xc, preferred_element_type=jnp.float32)

ms = benchmark_loop(mv, jnp.ones((N,), jnp.float32), args=(a8, x8))
print(f"matvec emitter: {flops/(ms*1e-3)/1e9:7.1f} GF/s", flush=True)
