"""Probe r4c: ragged bf16 DOT — zero-copy XLA route vs the pad fallback.

The 16-bit (L,)->(rows,128) in-register view crashes Mosaic, so ragged bf16
DOT kept an O(n) pad copy (~3x bytes). New routing sends the acc32-over-bf16
tier at ragged n through XLA's native bf16 dot (exact f32 MXU accumulate —
the f8 tier's 91% route). Measure both at a ragged endpoint-scale n:

  default        -> the new XLA-composed route (auto)
  resident=False -> the streaming Pallas kernel (pad fallback)

Target: default ~= the aligned acc32 endpoint (376-379 GF/s at 2^29).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_r4c.py
"""
import jax
import jax.numpy as jnp

from accblas_tpu.ops import dot as dotops
from accblas_tpu.utils import devgen
from accblas_tpu.utils.bench import benchmark_loop

print("devices:", jax.devices(), flush=True)

N = 123_456_789  # ragged vs both the 128-lane and (16,128) bf16 tile
xb = devgen.gen_f32((N,), 42, "p4c_x").astype(jnp.bfloat16)
yb = devgen.gen_f32((N,), 42, "p4c_y").astype(jnp.bfloat16)
flops = 2.0 * N


def make_body(resident):
    def body(c, x, y):
        s, yc = c
        yc = yc.at[0].add((s * 1e-30).astype(yc.dtype))
        return dotops.acc_dot(x, yc, ar="f32", resident=resident), yc
    return body


for tag, resident in (("XLA route (auto)", None), ("pad fallback", False)):
    try:
        ms = benchmark_loop(
            make_body(resident), (jnp.float32(0.0), yb), args=(xb, yb)
        )
        gf = flops / (ms * 1e-3) / 1e9
        print(f"{tag:20s} {gf:8.1f} GF/s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{tag:20s} FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)

# aligned reference at a comparable n (the 2^27-element aligned tier)
NA = 2**27
xa = devgen.gen_f32((NA,), 42, "p4c_xa").astype(jnp.bfloat16)
ya = devgen.gen_f32((NA,), 42, "p4c_ya").astype(jnp.bfloat16)
ms = benchmark_loop(make_body(None), (jnp.float32(0.0), ya), args=(xa, ya))
print(f"{'aligned 2^27 (ref)':20s} {2.0 * NA / (ms * 1e-3) / 1e9:8.1f} GF/s",
      flush=True)
