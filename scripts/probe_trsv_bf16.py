"""Probe: bf16-storage TRSV regression from the one-pass leaf-diag extract
(394 -> 323 GF/s at n=24576, 267 -> 105 at n=4096 in the round-3 rerun).
Hypothesis: leaf=64 static slices on a bf16 ref pay Mosaic 16-bit sub-lane
relayouts; fix casts the block to f32 array-level before slicing.

Times acc_trsv bf16 (and fp32 control) at n=4096 / 24576 with the chained
harness (b consumed through the solve).
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from accblas_tpu.ops import trsv as trsvops
from accblas_tpu.utils.bench import benchmark_loop

print("devices:", jax.devices(), flush=True)


def make_tri(n, dtype):
    @jax.jit
    def gen():
        k = jax.random.PRNGKey(7)
        a = jax.random.uniform(k, (n, n), jnp.float32, -1.0, 1.0)
        # upper-triangular with unit-ish diagonal dominance (enough for a
        # timing probe; error is not the subject here)
        r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        u = jnp.where(r <= c, a, 0.0)
        return u.astype(dtype)

    return jax.block_until_ready(gen())


for n in (4096, 24576):
    b = jnp.ones((n,), jnp.float32)
    for dt, name in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        a = make_tri(n, dt)

        def body(c, a):
            return trsvops.acc_trsv(a, jnp.clip(c, -1.0, 1.0), "upper", True,
                                    unstable_ok=True)

        ms = benchmark_loop(body, b, args=(a,))
        gf = (n * n) / (ms * 1e-3) / 1e9
        print(f"n={n} {name}: {ms:.3f} ms = {gf:.1f} GF/s", flush=True)
