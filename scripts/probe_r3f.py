"""Round-3 probe part 6: validate the new TRSV routing on hardware.

- default trsv() (auto -> XLA-composed blocked substitution at all f32 sizes)
  should reproduce probe_r3e's 360-367 GF/s, including ragged n
- bf16/df64 accessor tiers keep the Pallas sweep (unchanged numbers)
- ragged sweep with the cond-gated boundary mask (was 282/243 bf16/df64 at
  23680 with the unconditional where)
- TRSM k=128 at n=8192: Pallas panel sweep vs the XLA-composed schedule
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
    ab_full = a_full.astype(jnp.bfloat16)

    for n in (12416, 23680, 24576):
        a = a_full[:n, :n]
        ab = ab_full[:n, :n]
        b = jnp.ones((n,), jnp.float32)
        flops = float(n) * n

        def bdef(c, a):
            return trsvops.trsv(a, jnp.clip(c, -1.0, 1.0), "upper", False)

        def bbf(c, ab):
            return trsvops.acc_trsv(ab, jnp.clip(c, -1.0, 1.0), "upper", False,
                                    resident=False, unstable_ok=True)

        def bdf(c, a):
            return trsvops.acc_trsv(a, jnp.clip(c, -1.0, 1.0), "upper", False,
                                    ar="df64")

        msd = benchmark_loop(bdef, b, args=(a,))
        msbf = benchmark_loop(bbf, b, args=(ab,))
        msdf = benchmark_loop(bdf, b, args=(a,))
        log(f"n={n} default(f32) {flops/(msd*1e-3)/1e9:6.1f} "
            f"bf16-sweep {flops/(msbf*1e-3)/1e9:6.1f} "
            f"df64-sweep {flops/(msdf*1e-3)/1e9:6.1f} GF/s")

    # TRSM k=128 at 8192: Pallas panel sweep vs XLA-composed
    n, k = 8192, 128
    a = a_full[:n, :n]
    bm = jnp.ones((n, k), jnp.float32)
    tflops = 1.0 * n * n * k

    def tswp(c, a):
        return trsvops.trsm(a, jnp.clip(c, -1.0, 1.0), "upper", False,
                            resident=False)

    def tres(c, a):
        return trsvops.trsm(a, jnp.clip(c, -1.0, 1.0), "upper", False,
                            resident=True)

    mss = benchmark_loop(tswp, bm, args=(a,))
    msr = benchmark_loop(tres, bm, args=(a,))
    log(f"TRSM n={n} k={k} pallas {tflops/(mss*1e-3)/1e12:6.2f} "
        f"xla-composed {tflops/(msr*1e-3)/1e12:6.2f} TF/s")


if __name__ == "__main__":
    main()
