"""Probe r3n: wide-panel TRSM fast path (native TriangularSolve) at HIGHEST.

The n<=1024, k>=32 f32 fast path routed to XLA's native TriangularSolve on a
probe that measured it at DEFAULT matmul precision (11.8 vs 10.5 TF/s at
n=512, k=128 vs the blocked substitution). The review fix (31d28c3) pinned it
to HIGHEST for correctness — re-measure: if HIGHEST costs the native path its
lead, the fast path should be deleted and everything routed to _trsv_small.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_r3n.py
"""
import jax
import jax.numpy as jnp
import numpy as np

from accblas_tpu.ops import trsv as trsvops
from accblas_tpu.utils.bench import benchmark_loop

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(42)

for n in (512, 1024):
    k = 128
    a = jnp.asarray(
        np.triu(rng.uniform(-1, 1, (n, n))) + np.eye(n) * 4.0, jnp.float32
    )
    b = jnp.asarray(rng.uniform(-1, 1, (n, k)), jnp.float32)
    flops = float(n) * n * k  # triangle: n^2/2 * 2 flops per rhs

    def body_native(c, a_, b_):
        bc = b_.at[0, 0].add(c[0, 0] * 1e-30)
        return trsvops.trsm(a_, bc, "upper", False)  # resident=None fast path

    def body_small(c, a_, b_):
        bc = b_.at[0, 0].add(c[0, 0] * 1e-30)
        return trsvops.trsm(a_, bc, "upper", False, resident=True)

    for name, body in (("native-HI", body_native), ("blocked", body_small)):
        ms = benchmark_loop(body, b, args=(a, b))
        print(f"n={n} k={k} {name}: {flops/(ms*1e-3)/1e12:6.2f} TF/s", flush=True)
