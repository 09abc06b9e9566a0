"""Probe r3h: can bf16/f16 single-rhs TRSV ride the blocked-XLA schedule?

The f32 tier routes through _trsv_small at every size since 50e154b
(367 GF/s at 24576 vs the Pallas sweep's 350). bf16 storage halves the
triangle bytes (roofline ~2x), but the gate restricts k==1 auto-routing to
f32 storage because _trsv_small used to cast the whole matrix upfront.
With per-slice casts (XLA fuses slice+convert into the dot feed — the
fusion that put bf16 TRSM at 44.5 TF/s) the blocked schedule may now beat
the sweep for narrow storage too. Measure both at several n.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_r3h.py
"""
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from accblas_tpu.ops import trsv as trsv_mod
from accblas_tpu.utils.bench import benchmark_loop

print("devices:", jax.devices())


def run(n, st):
    rng = np.random.default_rng(42)
    a64 = np.tril(rng.uniform(-1, 1, (n, n))) + n * np.eye(n)
    b64 = rng.uniform(-1, 1, n)
    dt = {"bf16": jnp.bfloat16, "f16": jnp.float16, "f32": jnp.float32}[st]
    a = jax.device_put(jnp.asarray(a64, dt))
    b = jax.device_put(jnp.asarray(b64, dt))

    small = jax.jit(
        functools.partial(trsv_mod._trsv_small, uplo="lower", unit=False, st_out="f32")
    )
    def sweep_fn(a_, b_):
        return trsv_mod._trsv_impl(a_, b_, "lower", False, None, "f32",
                                   resident=False)
    sweep = jax.jit(sweep_fn)

    flops = n * n
    r = {}
    for name, fn in [("blocked", small), ("sweep", sweep)]:
        def body(c, a_, fn=fn, dt=dt):
            return fn(a_, jnp.clip(c, -1.0, 1.0).astype(dt))

        ms = benchmark_loop(body, b.astype(jnp.float32), args=(a,))
        r[name] = flops / (ms * 1e-3) / 1e9
    x1 = np.asarray(small(a, b), np.float64)
    x2 = np.asarray(sweep(a, b), np.float64)
    rel = np.linalg.norm(x1 - x2) / max(np.linalg.norm(x2), 1e-300)
    print(f"{st} n={n}: blocked {r['blocked']:7.1f}  sweep {r['sweep']:7.1f} GF/s"
          f"  rel {rel:.2e}", flush=True)


sizes = tuple(int(s) for s in os.environ.get(
    "PROBE_SIZES", "4096,8192,16384,23680,24576").split(","))
for st in ("bf16", "f16"):
    for n in sizes:
        run(n, st)
