"""Probe r4d: blocked-XLA TRSV route — refinement cost x block size.

Two questions for the post-campaign integration:
1. What does the round-4 diagonal-block refinement (accuracy fix, commit
   1ff04e7) cost on hardware? (refine on vs off at the shipped block=512)
2. Does a larger block lift the blocked-XLA route the way BLOCK_VEC=1024
   lifted the Pallas sweep (+9-15%, probe_r3b)? `_trsv_small` still runs
   512-wide blocks (48 serial steps at 24576); 1024/2048 halve/quarter the
   step count and widen every panel GEMV.

Grid: block in {512, 1024, 2048} x refine in {on, off} at n=24576, plus the
shipped config at 16384. VERDICT #7's target is fixed-f32 >= 380 GF/s at
24576 (today 367 pre-refinement).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_r4d.py
"""
import jax
import jax.numpy as jnp

import accblas_tpu.ops.trsv as trsv_mod
from accblas_tpu.ops import trsv as trsvops
from accblas_tpu.utils import devgen
from accblas_tpu.utils.bench import benchmark_loop

print("devices:", jax.devices(), flush=True)


def measure(n, a, label):
    b = jnp.ones((n,), jnp.float32)

    def body(c, a_):
        return trsvops.trsv(a_, jnp.clip(c, -1.0, 1.0), "upper", True,
                            resident=True)

    ms = benchmark_loop(body, b, args=(a,))
    gfs = n * n / (ms * 1e-3) / 1e9
    print(f"{label}: {gfs:.1f} GF/s ({ms:.3f} ms)", flush=True)
    return gfs


ORIG_BLOCK = trsv_mod.BLOCK
for n in (24576, 16384):
    a = devgen.gen_f32((n, n), 42, "p4d_a") * jnp.float32(1.0 / n)
    blocks = (512, 1024, 2048) if n == 24576 else (512,)
    for blk in blocks:
        trsv_mod.BLOCK = blk
        for refine_off in (False, True):
            trsv_mod._PROBE_DISABLE_REFINE = refine_off
            try:
                measure(n, a, f"n={n} block={blk} refine={not refine_off}")
            except Exception as e:  # noqa: BLE001 - probe fault isolation
                print(f"n={n} block={blk} refine={not refine_off}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
    trsv_mod.BLOCK = ORIG_BLOCK
    trsv_mod._PROBE_DISABLE_REFINE = False
    del a
print("probe_r4d done", flush=True)
