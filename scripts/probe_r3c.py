"""Round-3 probes, part 3 — post-campaign tuning candidates.

H: TRSV BLOCK_VEC=2048 (33 MiB double-buffered block under the 64 MiB scope).
I: TRSM BLOCK=768 (finer than 1024, coarser than 512).
J: GEMV f8 kcols grain: 2/4/8/16 — is 8 the knee?
K: fused df64 TRSV at small n (1024/2048) — the new routing's CSV story.
"""

import sys

import jax
import jax.numpy as jnp

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

    # --- K: small-n fused df64 ---
    for n in (1024, 2048):
        a = a_full[:n, :n]
        b = jnp.ones((n,), jnp.float32)
        flops = float(n) * n

        def bdf(c, a):
            return trsvops.acc_trsv(a, jnp.clip(c, -1.0, 1.0), "upper", True,
                                    ar="df64", resident=False)

        def b32(c, a):
            return trsvops.trsv(a, jnp.clip(c, -1.0, 1.0), "upper", True,
                                resident=False)

        msdf = benchmark_loop(bdf, b, args=(a,))
        ms32 = benchmark_loop(b32, b, args=(a,))
        log(f"K n={n} sweep f32 {flops/(ms32*1e-3)/1e9:6.1f} df64 "
            f"{flops/(msdf*1e-3)/1e9:6.1f} GF/s (refinement was ~10-20)")

    # --- H: BLOCK_VEC 2048 ---
    for n in (16384, 24576):
        a = a_full[:n, :n]
        b = jnp.ones((n,), jnp.float32)
        flops = float(n) * n
        for bv in (1024, 2048):
            old = trsvops.BLOCK_VEC
            trsvops.BLOCK_VEC = bv
            try:
                def b32v(c, a):
                    return trsvops.trsv(a, jnp.clip(c, -1.0, 1.0), "upper", True,
                                        resident=False)

                def bdfv(c, a):
                    return trsvops.acc_trsv(a, jnp.clip(c, -1.0, 1.0), "upper",
                                            True, ar="df64", resident=False)

                ms32 = benchmark_loop(b32v, b, args=(a,))
                msdf = benchmark_loop(bdfv, b, args=(a,))
                log(f"H n={n} BLOCK_VEC={bv} f32 {flops/(ms32*1e-3)/1e9:6.1f} "
                    f"df64 {flops/(msdf*1e-3)/1e9:6.1f} GF/s")
            except Exception as e:
                log(f"H n={n} bv={bv} FAILED {type(e).__name__}: {str(e)[:200]}")
            finally:
                trsvops.BLOCK_VEC = old

    # --- I: TRSM block 768 ---
    n, k = 8192, 128
    a = a_full[:n, :n]
    bk = jax.random.uniform(jax.random.PRNGKey(2), (n, k), jnp.float32, -1, 1)
    flops = float(n) * n * k
    for blk in (512, 768):
        old = trsvops.BLOCK
        trsvops.BLOCK = blk
        try:
            def m32(c, a):
                return trsvops.trsm(a, jnp.clip(c, -1.0, 1.0), "upper", True,
                                    resident=False)

            ms32 = benchmark_loop(m32, bk, args=(a,))
            log(f"I TRSM n={n} k={k} BLOCK={blk} fixed {flops/(ms32*1e-3)/1e12:6.2f} TF/s")
        except Exception as e:
            log(f"I blk={blk} FAILED {type(e).__name__}: {str(e)[:200]}")
        finally:
            trsvops.BLOCK = old
    del a, bk

    # --- J: f8 kcols grain ---
    n = 24576
    a8 = a_full.astype(jnp.float8_e4m3fn)
    del a_full
    x8 = jax.random.uniform(jax.random.PRNGKey(3), (n,), jnp.float32, -1, 1).astype(
        jnp.float8_e4m3fn
    )
    c0 = jnp.zeros((n,), jnp.float32)
    flops = 2.0 * n * n
    for kcols in (2, 4, 8, 16):
        def body(c, a8, x8, kcols=kcols):
            xc = (x8.astype(jnp.float32).at[0].add(c[0] * 1e-30)
                  .astype(jnp.float8_e4m3fn))
            x2 = jnp.zeros((n, kcols), jnp.float8_e4m3fn).at[:, 0].set(xc)
            return jnp.matmul(a8, x2, preferred_element_type=jnp.float32)[:, 0]

        ms = benchmark_loop(body, c0, args=(a8, x8))
        log(f"J f8 kcols={kcols:2d} {flops/(ms*1e-3)/1e9:7.1f} GF/s")
    log("probe_r3c done")


if __name__ == "__main__":
    main()
