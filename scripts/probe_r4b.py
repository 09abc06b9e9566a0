"""Probe r4b: TRSV diag-solve critical path — leaf size at block=1024.

The fixed tier sits at 86% of the triangle roofline (350.2 of ~406 GF/s at
24576). The gap ≈ the serial diagonal-solve chains: LEAF=64 at BLOCK_VEC=1024
means 16 leaves/diag block → ~136 serial (1,64)-row MXU dots per solve ×
nb=24 blocks. leaf=128/256 shortens the chain 4-16×; leaf inversion cost is
phase-1 (amortized). Measure fixed f32 + fused df64 at n=24576, block=1024,
leaf ∈ {64, 128, 256}.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_r4b.py
"""
import jax
import jax.numpy as jnp

from accblas_tpu.ops import trsv as trsvops
from accblas_tpu.utils import devgen
from accblas_tpu.utils.bench import benchmark_loop

print("devices:", jax.devices(), flush=True)

N = 24576
a = devgen.gen_f32((N, N), 42, "p4b_a") * jnp.float32(1.0 / N)
b = jnp.ones((N,), jnp.float32)
flops = float(N) * N


def make_body(ar):
    def body(c, a_):
        bc = jnp.clip(c, -1.0, 1.0)
        if ar == "f32":
            return trsvops.trsv(a_, bc, "upper", True, resident=False)
        return trsvops.acc_trsv(a_, bc, "upper", True, ar="df64",
                                resident=False)
    return body


for ar in ("f32", "df64"):
    # 512/1024 walk toward the full-block limit where the serial leaf chain
    # collapses to ONE (1, B)x(B, B) MXU dot per diag block (phase-1 cost
    # grows as B^3/3 per block but stays amortized; interpret-mode
    # correctness verified for every leaf up to the full block)
    for leaf in (64, 128, 256, 512, 1024):
        trsvops.LEAF = leaf  # read at trace time; fresh body per config
        try:
            ms = benchmark_loop(make_body(ar), b, args=(a,))
            gf = flops / (ms * 1e-3) / 1e9
            print(f"{ar:5s} leaf={leaf:4d}: {gf:7.1f} GF/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{ar:5s} leaf={leaf:4d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
