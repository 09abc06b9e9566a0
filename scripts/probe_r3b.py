"""Round-3 TPU probes, part 2.

F: BLOCK=1024 across the TRSV sweep sizes (adopt if it wins everywhere) +
   TRSM at 1024.
G: GEMV f8 lowering shapes — XLA's f8 *matvec* stalls at 1041 GF/s while its
   f8 DOT streams at 91% of roofline; try the GEMM emitter instead:
   x as (n, 1) / (n, 8) / (n, 128) f8 columns (A traffic identical).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from accblas_tpu.ops import trsv as trsvops
from accblas_tpu.utils.bench import benchmark_loop


def log(m):
    print(m, flush=True)


def main():
    log(f"devices: {jax.devices()}")
    nmax = 24576
    key = jax.random.PRNGKey(0)
    a_full = jax.random.uniform(key, (nmax, nmax), jnp.float32, -1, 1)
    a_full = a_full + nmax * 0.001 * jnp.eye(nmax, dtype=jnp.float32)
    jax.block_until_ready(a_full)

    # --- F ---
    for n in (8192, 24576):
        a = a_full[:n, :n]
        b = jnp.ones((n,), jnp.float32)
        flops = float(n) * n
        for blk in (512, 1024):
            old = trsvops.BLOCK
            trsvops.BLOCK = blk
            try:
                def b32(c, a):
                    return trsvops.trsv(a, jnp.clip(c, -1.0, 1.0), "upper", True,
                                        resident=False)

                def bdf(c, a):
                    return trsvops.acc_trsv(a, jnp.clip(c, -1.0, 1.0), "upper",
                                            True, ar="df64", resident=False)

                ms32 = benchmark_loop(b32, b, args=(a,))
                msdf = benchmark_loop(bdf, b, args=(a,))
                log(f"F n={n} BLOCK={blk} f32 {flops/(ms32*1e-3)/1e9:7.1f} "
                    f"df64 {flops/(msdf*1e-3)/1e9:7.1f} GF/s")
            finally:
                trsvops.BLOCK = old
    # TRSM at BLOCK=1024
    n, k = 8192, 128
    a = a_full[:n, :n]
    bk = jax.random.uniform(jax.random.PRNGKey(2), (n, k), jnp.float32, -1, 1)
    flops = float(n) * n * k
    for blk in (512, 1024):
        old = trsvops.BLOCK
        trsvops.BLOCK = blk
        try:
            def m32(c, a):
                return trsvops.trsm(a, jnp.clip(c, -1.0, 1.0), "upper", True,
                                    resident=False)

            def mdf(c, a):
                return trsvops.acc_trsm(a, jnp.clip(c, -1.0, 1.0), "upper", True,
                                        ar="df64")

            ms32 = benchmark_loop(m32, bk, args=(a,))
            msdf = benchmark_loop(mdf, bk, args=(a,))
            log(f"F TRSM n={n} k={k} BLOCK={blk} fixed {flops/(ms32*1e-3)/1e12:6.2f} "
                f"df64 {flops/(msdf*1e-3)/1e12:6.2f} TF/s")
        finally:
            trsvops.BLOCK = old
    del a, bk

    # --- G ---
    n = 24576
    a8 = a_full.astype(jnp.float8_e4m3fn)
    del a_full
    x8 = jax.random.uniform(jax.random.PRNGKey(3), (n,), jnp.float32, -1, 1).astype(
        jnp.float8_e4m3fn
    )
    flops = 2.0 * n * n
    c0 = jnp.zeros((n,), jnp.float32)

    def mk(kcols):
        def body(c, a8, x8):
            xc = (
                x8.astype(jnp.float32).at[0].add(c[0] * 1e-30)
                .astype(jnp.float8_e4m3fn)
            )
            if kcols == 0:
                return jnp.matmul(a8, xc, preferred_element_type=jnp.float32)
            x2 = jnp.zeros((n, kcols), jnp.float8_e4m3fn).at[:, 0].set(xc)
            out = jnp.matmul(a8, x2, preferred_element_type=jnp.float32)
            return out[:, 0]
        return body

    for kcols in (0, 1, 8, 128):
        try:
            ms = benchmark_loop(mk(kcols), c0, args=(a8, x8))
            log(f"G f8 matvec kcols={kcols:3d} {flops/(ms*1e-3)/1e9:7.1f} GF/s")
        except Exception as e:
            log(f"G kcols={kcols}: FAILED {type(e).__name__}: {str(e)[:300]}")

    # bf16 x against f8 A (mixed): does the emitter stream A without a copy?
    def body_mixed(c, a8, x8):
        xb = x8.astype(jnp.bfloat16).at[0].add((c[0] * 1e-30).astype(jnp.bfloat16))
        return jnp.matmul(a8.astype(jnp.bfloat16), xb,
                          preferred_element_type=jnp.float32)

    ms = benchmark_loop(body_mixed, c0, args=(a8, x8))
    log(f"G f8->bf16 cast + bf16 matvec {flops/(ms*1e-3)/1e9:7.1f} GF/s")
    log("probe_r3b done")


if __name__ == "__main__":
    main()
