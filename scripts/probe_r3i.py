"""Probe r3i: validate the wide-panel small-n TRSM vendor window.

trsm(a_f32, b, ...) at n in {512, 1024} k=128 now routes to XLA's native
TriangularSolve (trsm_flops measured it 12%/3% above the blocked-inverse
substitution there). Check the routing's throughput + correctness vs the
blocked schedule, and that bf16 storage still takes the blocked path.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_r3i.py
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from accblas_tpu.ops import trsv as trsv_mod
from accblas_tpu.utils.bench import benchmark_loop

print("devices:", jax.devices())


def run(n, k, st):
    rng = np.random.default_rng(42)
    a64 = np.tril(rng.uniform(-1, 1, (n, n))) + n * np.eye(n)
    b64 = rng.uniform(-1, 1, (n, k))
    dt = {"bf16": jnp.bfloat16, "f32": jnp.float32}[st]
    a = jax.device_put(jnp.asarray(a64, dt))
    b = jax.device_put(jnp.asarray(b64, jnp.float32))

    default = jax.jit(functools.partial(
        trsv_mod._trsm_impl, uplo="lower", unit=False, interpret=None,
        st_out="f32"))
    blocked = jax.jit(functools.partial(
        trsv_mod._trsv_small, uplo="lower", unit=False, st_out="f32"))

    flops = n * n * k
    r = {}
    for name, fn in [("default", default), ("blocked", blocked)]:
        def body(c, a_, fn=fn):
            return fn(a_, jnp.clip(c, -1.0, 1.0))

        ms = benchmark_loop(body, b, args=(a,))
        r[name] = flops / (ms * 1e-3) / 1e12
    x1 = np.asarray(default(a, b), np.float64)
    x2 = np.asarray(blocked(a, b), np.float64)
    rel = np.linalg.norm(x1 - x2) / max(np.linalg.norm(x2), 1e-300)
    print(f"{st} n={n} k={k}: default {r['default']:6.2f}"
          f"  blocked {r['blocked']:6.2f} TF/s  rel {rel:.2e}", flush=True)


for st in ("f32", "bf16"):
    for n in (512, 1024, 2048):
        run(n, 128, st)

# revalidate the wide-panel endpoints under the per-slice storage cast
# (trsm_flops measured f32 24.8 / bf16 44.1 TF/s with the upfront astype)
for st in ("f32", "bf16"):
    run(16384, 128, st)
