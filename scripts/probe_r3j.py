"""Probe r3j: final TRSV/TRSM routing validation through the PUBLIC API.

After the probe_r3h/r3i changes:
  * trsv bf16/f16 single-rhs auto-routes to the blocked-XLA schedule with
    per-slice fused casts (expect ~692/693 GF/s at 24576, sweep gave 398/80);
  * trsm narrow-storage wide panels (k>=32) restore the upfront f32 cast
    (expect bf16 ~44 TF/s at 16384, per-slice form measured 38.4);
  * trsm f32 n<=1024 k>=32 takes the XLA TriangularSolve vendor window
    (expect 11.7/15.9 TF/s at 512/1024).
Each timed row also checks the routed result against the Pallas sweep.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_r3j.py
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from accblas_tpu.ops import trsv as trsv_mod
from accblas_tpu.ops.trsv import trsv
from accblas_tpu.utils.bench import benchmark_loop

print("devices:", jax.devices())


def gf(flops, ms):
    return flops / (ms * 1e-3) / 1e9


def run_trsv(a, st, n):
    b = jnp.ones((n,), a.dtype)
    routed = jax.jit(functools.partial(trsv, uplo="lower", unit=False))
    sweep = jax.jit(functools.partial(
        trsv, uplo="lower", unit=False, resident=False))

    def body(c, a_):
        return trsv(a_, jnp.clip(c, -1.0, 1.0).astype(a_.dtype),
                    "lower", False).astype(jnp.float32)

    ms = benchmark_loop(body, jnp.ones((n,), jnp.float32), args=(a,))
    x1 = np.asarray(routed(a, b), np.float64)
    x2 = np.asarray(sweep(a, b), np.float64)
    rel = np.linalg.norm(x1 - x2) / max(np.linalg.norm(x2), 1e-300)
    print(f"trsv {st} n={n}: routed {gf(n * n, ms):7.1f} GF/s"
          f"  rel-vs-sweep {rel:.2e}", flush=True)


def run_trsm(a, st, n, k):
    b = jnp.ones((n, k), jnp.float32)
    routed = jax.jit(functools.partial(
        trsv_mod._trsm_impl, uplo="lower", unit=False, interpret=None,
        st_out="f32"))
    sweep = jax.jit(functools.partial(
        trsv_mod._trsm_impl, uplo="lower", unit=False, interpret=None,
        st_out="f32", resident=False))

    def body(c, a_):
        return routed(a_, jnp.clip(c, -1.0, 1.0))

    ms = benchmark_loop(body, b, args=(a,))
    x1 = np.asarray(routed(a, b), np.float64)
    x2 = np.asarray(sweep(a, b), np.float64)
    rel = np.linalg.norm(x1 - x2) / max(np.linalg.norm(x2), 1e-300)
    print(f"trsm {st} n={n} k={k}: routed {gf(n * n * k, ms) / 1e3:7.2f} TF/s"
          f"  rel-vs-sweep {rel:.2e}", flush=True)


def mk(n, dt):
    rng = np.random.default_rng(42)
    a64 = np.tril(rng.uniform(-1, 1, (n, n))) + n * np.eye(n)
    return jax.device_put(jnp.asarray(a64, dt))


for st, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
    for n in (512, 1024):
        run_trsm(mk(n, dt), st, n, 128)

a = mk(24576, jnp.bfloat16)
run_trsv(a, "bf16", 24576)
run_trsv(jax.jit(lambda x: x.astype(jnp.float16))(a), "f16", 24576)
del a

run_trsm(mk(16384, jnp.bfloat16), "bf16", 16384, 128)
