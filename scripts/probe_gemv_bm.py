"""Probe: volume-targeted row-panel caps for the fullrow GEMV.

The dense-grid sweep measured the Pallas fullrow path far under XLA's bf16
matvec at mid sizes (461 vs 677 GF/s at n=3200, 0.93x at 23680): a 128-row
panel is <1 MiB there and the fixed per-grid-step cost dominates. The caps
now target ~8 MiB per step (plain) / conditional 256 (df64). This measures
fixed bf16 / Acc<f32,bf16> / Acc<df64,bf16> / fixed f32 at the dip sizes +
the pow2 endpoint (regression check for the measured-good configs).
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from accblas_tpu.ops import gemv as gemvops
from accblas_tpu.utils.bench import benchmark_loop

print("devices:", jax.devices(), flush=True)

MAX = 24576
k = jax.random.PRNGKey(11)
a_full = jax.block_until_ready(
    jax.jit(lambda k: jax.random.uniform(k, (MAX, MAX), jnp.float32, -1.0, 1.0))(k)
)

for n in (3200, 8320, 16384, 23680, 24576):
    a32 = a_full[:n, :n]
    ab = jax.jit(lambda a: a.astype(jnp.bfloat16))(a32)
    x = jnp.ones((n,), jnp.float32)

    def run(name, a, ar):
        xs = x.astype(a.dtype)

        def body(c, a, xs):
            # res carries: beta=1 consumes c through the epilogue; the matvec
            # itself reads a (operand arg) — chain via res as the drivers do
            return gemvops.acc_gemv(a, xs, c, 1.0, 1e-6, ar=ar)

        ms = benchmark_loop(body, x, args=(a, xs))
        gf = 2.0 * n * n / (ms * 1e-3) / 1e9
        print(f"n={n:6d} {name:14s} {ms:7.3f} ms = {gf:7.1f} GF/s", flush=True)

    run("bf16 fixed", ab, "bf16")
    run("Acc<f32,bf16>", ab, "f32")
    run("Acc<df64,bf16>", ab, "df64")
    run("f32 fixed", a32, "f32")
