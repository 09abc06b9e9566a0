"""Probe r4d: cost of the round-4 diagonal-block refinement in the blocked
TRSV route, and whether a cheaper schedule recovers it.

Round 4 added one residual-correction step per diagonal-block application
(k < 32) to `_trsv_small` — it repairs the error endpoint (9.96e-5 -> XLA-
class; see commit 1ff04e7) at ~8% extra diag-block traffic. This probe
measures the fixed-f32 single-rhs rate at 24576/16384 with refinement ON
(shipped) vs OFF (monkeypatched), so the post-campaign integration can state
the accuracy fix's measured cost next to VERDICT #7's 380 GF/s target.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_r4d.py
"""
import jax
import jax.numpy as jnp

from accblas_tpu.ops import trsv as trsvops
from accblas_tpu.utils import devgen
from accblas_tpu.utils.bench import benchmark_loop

print("devices:", jax.devices(), flush=True)


def measure(n, refine_on):
    a = devgen.gen_f32((n, n), 42, "p4d_a") * jnp.float32(1.0 / n)
    b = jnp.ones((n,), jnp.float32)

    def body(c, a_):
        return trsvops.trsv(a_, jnp.clip(c, -1.0, 1.0), "upper", True,
                            resident=True)

    ms = benchmark_loop(body, b, args=(a,))
    gfs = n * n / (ms * 1e-3) / 1e9
    print(f"n={n} refine={refine_on}: {gfs:.1f} GF/s ({ms:.3f} ms)",
          flush=True)
    return gfs


import accblas_tpu.ops.trsv as trsv_mod

for n in (16384, 24576):
    measure(n, True)

# OFF variant: same solve with the refinement suppressed via the probe-only
# module flag (read at trace time; each measure() call retraces).
trsv_mod._PROBE_DISABLE_REFINE = True
try:
    for n in (16384, 24576):
        measure(n, False)
finally:
    trsv_mod._PROBE_DISABLE_REFINE = False
print("probe_r4d done", flush=True)
