"""Round-3 probe part 7: TRSM routing — Pallas panel sweep vs XLA-composed
blocked substitution across (n, k) and storage dtypes.

probe_r3f measured xla-composed 22.49 vs pallas 21.46 TF/s at (8192, 128)
f32. Map the rest of the space before changing the default route.
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
    nmax = 16384
    key = jax.random.PRNGKey(0)
    a_full = jax.random.uniform(key, (nmax, nmax), jnp.float32, -1, 1)
    a_full = a_full + nmax * 0.001 * jnp.eye(nmax, dtype=jnp.float32)
    jax.block_until_ready(a_full)
    ab_full = a_full.astype(jnp.bfloat16)

    for n, k in ((8192, 16), (16384, 16), (16384, 128), (8192, 512)):
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
        log(f"TRSM f32 n={n} k={k} pallas {tflops/(mss*1e-3)/1e12:6.2f} "
            f"xla-composed {tflops/(msr*1e-3)/1e12:6.2f} TF/s")

    for n, k in ((8192, 128), (16384, 128)):
        ab = ab_full[:n, :n]
        bm = jnp.ones((n, k), jnp.float32)
        tflops = 1.0 * n * n * k

        def tswp_b(c, ab):
            return trsvops.acc_trsm(ab, jnp.clip(c, -1.0, 1.0), "upper", False,
                                    resident=False, unstable_ok=True)

        def tres_b(c, ab):
            return trsvops.acc_trsm(ab, jnp.clip(c, -1.0, 1.0), "upper", False,
                                    resident=True, unstable_ok=True)

        mss = benchmark_loop(tswp_b, bm, args=(ab,))
        msr = benchmark_loop(tres_b, bm, args=(ab,))
        log(f"TRSM bf16 n={n} k={k} pallas {tflops/(mss*1e-3)/1e12:6.2f} "
            f"xla-composed {tflops/(msr*1e-3)/1e12:6.2f} TF/s")


if __name__ == "__main__":
    main()
