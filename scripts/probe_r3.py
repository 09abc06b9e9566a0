"""Round-3 TPU probes (run on the real chip; results drive tuning decisions).

A: fused one-pass df64 TRSV vs fixed f32 at n = 8192/16384/24576 — the
   storage-speed-equivalence claim for the last kernel family (VERDICT #1).
B: BLOCK=1024 under the 64 MiB VMEM scope at n=16384 (VERDICT #10).
C: TRSM fixed vs fused df64 at n=8192, k=128 (VERDICT #2).
D: GEMV f8e4m3 raw-MXU-feed at 24576^2 (VERDICT #4; target >= 1400 GF/s).
E: ragged GEMV (n=24503) fp32/df64 via the overlap-masked tail vs XLA
   (VERDICT #5; target within 10% of aligned).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from accblas_tpu.ops import gemv as gemvops
from accblas_tpu.ops import trsv as trsvops
from accblas_tpu.utils.bench import benchmark_loop


def log(msg):
    print(msg, flush=True)


def main():
    log(f"devices: {jax.devices()}")
    nmax = 24576
    key = jax.random.PRNGKey(0)
    a_full = jax.random.uniform(key, (nmax, nmax), jnp.float32, -1, 1)
    a_full = a_full + nmax * 0.001 * jnp.eye(nmax, dtype=jnp.float32)
    jax.block_until_ready(a_full)
    log("matrix ready")

    # --- A: fused df64 TRSV vs fixed f32 ---
    for n in (8192, 16384, 24576):
        a = a_full[:n, :n]
        b = jnp.ones((n,), jnp.float32)
        flops = float(n) * n

        def body32(c, a):
            return trsvops.trsv(a, jnp.clip(c, -1.0, 1.0), "upper", True,
                                resident=False)

        def bodydf(c, a):
            return trsvops.acc_trsv(a, jnp.clip(c, -1.0, 1.0), "upper", True,
                                    ar="df64", resident=False)

        ms32 = benchmark_loop(body32, b, args=(a,))
        msdf = benchmark_loop(bodydf, b, args=(a,))
        log(f"A n={n:6d} fixed-f32 {flops/(ms32*1e-3)/1e9:7.1f} GF/s   "
            f"acc-df64 {flops/(msdf*1e-3)/1e9:7.1f} GF/s   ratio {ms32/msdf:.3f}")

    # --- B: BLOCK=1024 probe at n=16384 ---
    n = 16384
    a = a_full[:n, :n]
    b = jnp.ones((n,), jnp.float32)
    flops = float(n) * n
    for blk in (512, 1024):
        old = trsvops.BLOCK
        trsvops.BLOCK = blk
        try:
            def body32b(c, a):
                return trsvops.trsv(a, jnp.clip(c, -1.0, 1.0), "upper", True,
                                    resident=False)

            def bodydfb(c, a):
                return trsvops.acc_trsv(a, jnp.clip(c, -1.0, 1.0), "upper", True,
                                        ar="df64", resident=False)

            ms32 = benchmark_loop(body32b, b, args=(a,))
            msdf = benchmark_loop(bodydfb, b, args=(a,))
            log(f"B n=16384 BLOCK={blk} f32 {flops/(ms32*1e-3)/1e9:7.1f} GF/s  "
                f"df64 {flops/(msdf*1e-3)/1e9:7.1f} GF/s")
        finally:
            trsvops.BLOCK = old

    # --- C: TRSM at n=8192, k=128 ---
    n, k = 8192, 128
    a = a_full[:n, :n]
    bk = jax.random.uniform(jax.random.PRNGKey(2), (n, k), jnp.float32, -1, 1)
    flops = float(n) * n * k

    def bodym32(c, a):
        return trsvops.trsm(a, jnp.clip(c, -1.0, 1.0), "upper", True,
                            resident=False)

    def bodymdf(c, a):
        return trsvops.acc_trsm(a, jnp.clip(c, -1.0, 1.0), "upper", True,
                                ar="df64")

    ms32 = benchmark_loop(bodym32, bk, args=(a,))
    msdf = benchmark_loop(bodymdf, bk, args=(a,))
    log(f"C TRSM n={n} k={k} fixed {flops/(ms32*1e-3)/1e12:7.2f} TF/s  "
        f"df64 {flops/(msdf*1e-3)/1e12:7.2f} TF/s  ratio {ms32/msdf:.3f}")

    # --- D: GEMV f8 raw feed at 24576^2 ---
    n = 24576
    a8 = a_full.astype(jnp.float8_e4m3fn)
    x8 = jax.random.uniform(jax.random.PRNGKey(3), (n,), jnp.float32, -1, 1).astype(
        jnp.float8_e4m3fn
    )
    r = jnp.zeros((n,), jnp.float32)
    flops = 2.0 * n * n

    def bodyf8(c, a8, x8):
        xc = x8.astype(jnp.float32).at[0].add(c[0] * 1e-30).astype(jnp.float8_e4m3fn)
        return gemvops.acc_gemv(a8, xc, c, 1.0, 1.0, ar="f32")

    msf8 = benchmark_loop(bodyf8, r, args=(a8, x8))
    log(f"D GEMV f8 24576^2 {flops/(msf8*1e-3)/1e9:7.1f} GF/s "
        f"(roofline 1638; round-2 was 1042)")
    del a8, x8

    # --- E: ragged GEMV ---
    x_full = jax.random.uniform(jax.random.PRNGKey(4), (nmax,), jnp.float32, -1, 1)
    for n in (24503, 24576):
        a = a_full[:n, :n]
        x = x_full[:n]
        rr = jnp.zeros((n,), jnp.float32)
        flops = 2.0 * float(n) * n

        def mk(kind):
            def body(c, a, x, kind=kind):
                xc = x.at[0].add(c[0] * 1e-30)
                if kind == "fixed":
                    return gemvops.gemv(a, xc, c, 1.0, 1.0)
                if kind == "df":
                    return gemvops.acc_gemv(a, xc, c, 1.0, 1.0, ar="df64")
                return gemvops.xla_gemv(a, xc, c, 1.0, 1.0)
            return body

        for kind in ("fixed", "df", "xla"):
            try:
                ms = benchmark_loop(mk(kind), rr, args=(a, x))
                log(f"E GEMV n={n} {kind:5s} {flops/(ms*1e-3)/1e9:7.1f} GF/s")
            except Exception as e:
                log(f"E GEMV n={n} {kind}: FAILED {type(e).__name__}: {str(e)[:300]}")

    log("probe_r3 done")


if __name__ == "__main__":
    main()
