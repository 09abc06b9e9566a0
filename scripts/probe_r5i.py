"""probe_r5i — where does the chunked 16384x512 TRSM rate go?

campaign_r5h (trsm_rhs512.csv) measured the rhs-chunk gate's 512-rhs
solve at ~14 ms for EVERY tier (f32 19.5 / bf16 18.8 / f8 19.4 TF/s),
while the per-chunk 128-rhs rates differ 2x (f32 24.8 / bf16 44.4 /
f8 42.4, trsm_flops.csv) — ideal chunked bf16 would be ~6.2 ms. The
uniform time says the chunked composition hits a tier-independent
bottleneck (scheduling/serialization or memory traffic), not the GEMM
rate. This probe decomposes it at n=16384, k=512:

  I128   one 128-rhs solve (the per-chunk rate reference, in-probe)
  C128   shipped chunk gate (4 x 128-col chunks inside one jit)
  H128   chunk loop over a PRE-CAST f32 matrix (hoists the narrow-storage
         upfront materialization; tests the CSE-failure hypothesis)
  C256   chunk width 256 (2 chunks; half the re-streams — compile risk:
         run last, per-variant fault isolation)

Tiers: f32 and bf16 storage (f8 tracks bf16 — both ride the upcast
2-pass GEMM class).

Usage (single TPU process!):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_r5i.py
"""

import os
import sys
import traceback

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from accblas_tpu.bench import common
from accblas_tpu.ops import trsv as trsvops
from accblas_tpu.utils import MatrixInfo, gen_mtx
from accblas_tpu.utils.bench import benchmark_loop

common.enable_compile_cache()

N = 16384
K = 512


def lu_master(max_n: int) -> np.ndarray:
    cache_dir = os.environ.get(
        "ACCBLAS_CACHE", os.path.expanduser("~/.cache/accblas_jit")
    )
    path = os.path.join(cache_dir, "lu64_seed42_n24576.npy")
    if os.path.exists(path):
        return np.load(path, mmap_mode="r")[:max_n, :max_n]
    import scipy.linalg

    a64 = gen_mtx(MatrixInfo(max_n, max_n), seed=42)
    lu64, _ = scipy.linalg.lu_factor(a64)
    return lu64


def tf_s(k: int, ms: float) -> float:
    return N * N * k / (ms * 1e-3) / 1e12


def time_variant(label, fn, a, b, k):
    def body(c, a_, b_):
        return fn(a_, jnp.clip(c, -1.0, 1.0).astype(b_.dtype))

    try:
        ms = benchmark_loop(body, b, args=(a, b))
    except Exception as e:  # per-variant fault isolation (C256 may blow
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)  # the compile envelope like k=512 did)
        return None
    print(f"{label}: {ms:.3f} ms = {tf_s(k, ms):.2f} TF/s", flush=True)
    return ms


def chunked_precast(a, b):
    """The shipped chunk loop with the narrow-storage f32 materialization
    hoisted OUT of the per-chunk calls (each _trsv_small chunk would
    otherwise cast a itself; identical math, tests whether XLA CSEs the
    4 duplicate casts)."""
    a32 = a.astype(jnp.float32)
    cols = [
        trsvops._trsv_small(a32, b[:, g : g + 128].astype(jnp.float32),
                            "upper", True, "f32")
        for g in range(0, b.shape[1], 128)
    ]
    return jnp.concatenate(cols, axis=1).astype(b.dtype)


def main():
    lu64 = lu_master(N)
    b64 = np.asarray(gen_mtx(MatrixInfo(N, K), seed=43))

    for st, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        a = jax.device_put(np.array(lu64, np.float32).astype(dt))
        b128 = jax.device_put(b64[:, :128].astype(np.float32)).astype(dt)
        b512 = jax.device_put(b64.astype(np.float32)).astype(dt)
        jax.block_until_ready((a, b128, b512))
        print(f"=== storage {st} (upper/unit)", flush=True)

        solve = jax.jit(lambda a_, b_: trsvops.acc_trsm(
            a_, b_, "upper", True, unstable_ok=True))
        time_variant(f"I128 {st} single 128-rhs", solve, a, b128, 128)
        time_variant(f"C128 {st} shipped chunked 512", solve, a, b512, K)
        if st != "f32":
            time_variant(
                f"H128 {st} pre-cast hoisted chunked 512",
                jax.jit(chunked_precast), a, b512, K)

    # C256 last: compile risk. Both tiers.
    old = trsvops._TRSM_CHUNK_K
    trsvops._TRSM_CHUNK_K = 256
    try:
        for st, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            a = jax.device_put(np.array(lu64, np.float32).astype(dt))
            b512 = jax.device_put(b64.astype(np.float32)).astype(dt)
            jax.block_until_ready((a, b512))
            solve = jax.jit(lambda a_, b_: trsvops.acc_trsm(
                a_, b_, "upper", True, unstable_ok=True))
            time_variant(f"C256 {st} chunk=256 512", solve, a, b512, K)
    finally:
        trsvops._TRSM_CHUNK_K = old
    print("probe_r5i done", flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception:
        traceback.print_exc()
        sys.exit(1)
