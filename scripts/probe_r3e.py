"""Round-3 probe part 5: resident-mode ceiling at large n.

probe_r3d showed the XLA-composed blocked substitution (resident mode)
beating the Pallas sweep at every size 2176-6272 (348 vs 227 GF/s at 6272)
and still climbing. Find the crossover (if any) up to the 24576 endpoint,
check solution agreement, and note compile times.
"""

import sys
import time

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

    for n in (8192, 12416, 16384, 20608, 24576):
        a = a_full[:n, :n]
        b = jnp.ones((n,), jnp.float32)
        flops = float(n) * n

        def bres(c, a):
            return trsvops.trsv(a, jnp.clip(c, -1.0, 1.0), "upper", False,
                                resident=True)

        def bswp(c, a):
            return trsvops.trsv(a, jnp.clip(c, -1.0, 1.0), "upper", False,
                                resident=False)

        t0 = time.time()
        xr = jax.jit(lambda a, b: trsvops.trsv(a, b, "upper", False, resident=True))(a, b)
        jax.block_until_ready(xr)
        tc = time.time() - t0
        xs = jax.jit(lambda a, b: trsvops.trsv(a, b, "upper", False, resident=False))(a, b)
        jax.block_until_ready(xs)
        import numpy as np

        agree = float(np.max(np.abs(np.asarray(xr, np.float64) - np.asarray(xs, np.float64)))
                      / max(1e-30, float(np.max(np.abs(np.asarray(xs, np.float64))))))
        msr = benchmark_loop(bres, b, args=(a,))
        mss = benchmark_loop(bswp, b, args=(a,))
        log(f"n={n} resident {flops/(msr*1e-3)/1e9:6.1f} sweep {flops/(mss*1e-3)/1e9:6.1f} "
            f"GF/s  res-vs-sweep rel {agree:.2e}  res compile+run {tc:.1f}s")


if __name__ == "__main__":
    main()
