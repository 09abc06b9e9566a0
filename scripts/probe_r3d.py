"""Round-3 probes, part 4 — post-ragged-fix candidates.

L: ragged TRSV via the zero-copy sweep (n=23680, 13440) — validates the
   unpadded boundary-masked path on hardware against the padded numbers
   (45-65 GF/s, bench_results/trsv_flops_dense.csv pre-fix).
M: resident-mode ceiling — resident vs sweep vs XLA TriangularSolve at
   n=2176..6272. XLA's resident solve measured 345/420/151 GF/s at
   2176/3200/4224 (dense CSV) while our gate stops at RESIDENT_N=2048;
   decide whether to raise it.
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
    nmax = 23680
    key = jax.random.PRNGKey(0)
    a_full = jax.random.uniform(key, (nmax, nmax), jnp.float32, -1, 1)
    a_full = a_full + nmax * 0.001 * jnp.eye(nmax, dtype=jnp.float32)
    jax.block_until_ready(a_full)
    ab_full = a_full.astype(jnp.bfloat16)

    # --- L: ragged sweep at scale ---
    for n in (13440, 23680):
        a = a_full[:n, :n]
        ab = ab_full[:n, :n]
        b = jnp.ones((n,), jnp.float32)
        flops = float(n) * n

        def b32(c, a):
            return trsvops.trsv(a, jnp.clip(c, -1.0, 1.0), "upper", True,
                                resident=False)

        def bbf(c, ab):
            return trsvops.acc_trsv(ab, jnp.clip(c, -1.0, 1.0), "upper", True,
                                    resident=False, unstable_ok=True)

        def bdf(c, a):
            return trsvops.acc_trsv(a, jnp.clip(c, -1.0, 1.0), "upper", True,
                                    ar="df64", resident=False)

        ms32 = benchmark_loop(b32, b, args=(a,))
        msbf = benchmark_loop(bbf, b, args=(ab,))
        msdf = benchmark_loop(bdf, b, args=(a,))
        log(f"L n={n} ragged sweep f32 {flops/(ms32*1e-3)/1e9:6.1f} "
            f"bf16 {flops/(msbf*1e-3)/1e9:6.1f} df64 {flops/(msdf*1e-3)/1e9:6.1f} "
            f"GF/s (pre-fix 61/102/59 at 13440, 63/109/62 at 23680)")

    # --- M: resident ceiling ---
    for n in (2176, 3200, 4224, 5248, 6272):
        a = a_full[:n, :n]
        b = jnp.ones((n,), jnp.float32)
        flops = float(n) * n

        def bres(c, a):
            return trsvops.trsv(a, jnp.clip(c, -1.0, 1.0), "upper", True,
                                resident=True)

        def bswp(c, a):
            return trsvops.trsv(a, jnp.clip(c, -1.0, 1.0), "upper", True,
                                resident=False)

        def bxla(c, a):
            return trsvops.xla_trsv(a, jnp.clip(c, -1.0, 1.0), "upper", True)

        msr = benchmark_loop(bres, b, args=(a,))
        mss = benchmark_loop(bswp, b, args=(a,))
        msx = benchmark_loop(bxla, b, args=(a,))
        log(f"M n={n} resident {flops/(msr*1e-3)/1e9:6.1f} "
            f"sweep {flops/(mss*1e-3)/1e9:6.1f} xla {flops/(msx*1e-3)/1e9:6.1f} GF/s")


if __name__ == "__main__":
    main()
