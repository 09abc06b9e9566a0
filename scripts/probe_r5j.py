"""probe_r5j — can optimization_barrier recover the per-tier chunked rate?

RESULT (v5e, 2026-08-19, bench_results/probe_r5j.log): NO — f32 7.049 /
bf16 7.315 / f8 7.078 ms, all within noise of the shipped chunk gate.
With CSE forcibly blocked the composition still lands on the same
tier-independent ~7 ms, so the wall is program-scale scheduling (see
BENCH_NOTES "TRSM rhs-scaling"), not operand sharing. The barrier is
NOT adopted; the shipped gate stays as-is.

probe_r5i pinned the chunked 16384x512 TRSM's tier-independent ~7 ms on
the composition running every chunk's panel GEMMs at f32 width: the four
chunks share one narrow->f32 convert (CSE), and the shared/materialized
operand loses the bf16-provenance strength reduction that gives a single
128-rhs chunk its 44.5 TF/s. Hypothesis: wrapping the matrix in
`jax.lax.optimization_barrier` PER CHUNK (the same trick jax.remat uses
to defeat CSE) gives each chunk its own convert, restoring the
single-chunk program per chunk. Ideal: bf16 4 x 0.772 = 3.1 ms
(44 TF/s vs shipped 18.7); f32 4 x 1.381 = 5.5 ms (24.9 vs 19.5).

Variants (n=16384, k=512, upper/unit, LU-factor triangle, seed 42):
  BAR  f32 / bf16 / f8e4m3: barrier-per-chunk loop (shippable if it wins
       — optimization_barrier is an identity, math unchanged)

(A default-precision diagnostic was considered and dropped: _trsv_small
passes precision=HIGHEST explicitly per matmul, so the
default_matmul_precision context cannot reach it.)

Usage (single TPU process!):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_r5j.py
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
CHUNK = 128


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
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None
    print(f"{label}: {ms:.3f} ms = {tf_s(k, ms):.2f} TF/s", flush=True)
    return ms


def chunked_barrier(a, b):
    """The shipped chunk loop with a per-chunk optimization_barrier on the
    matrix: 4 distinct barrier(a) values -> 4 un-CSE-able converts -> each
    chunk keeps its own fused narrow-width operand feed."""
    cols = []
    for g in range(0, b.shape[1], CHUNK):
        a_c = jax.lax.optimization_barrier(a)
        cols.append(
            trsvops.acc_trsm(a_c, b[:, g : g + CHUNK], "upper", True,
                             unstable_ok=True)
        )
    return jnp.concatenate(cols, axis=1)


def main():
    lu64 = lu_master(N)
    b64 = np.asarray(gen_mtx(MatrixInfo(N, K), seed=43))

    for st, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16),
                   ("f8e4m3", jnp.float8_e4m3fn)):
        a = jax.device_put(np.array(lu64, np.float32).astype(dt))
        b512 = jax.device_put(b64.astype(np.float32)).astype(
            jnp.float32 if st == "f8e4m3" else dt)
        jax.block_until_ready((a, b512))
        print(f"=== storage {st} (upper/unit)", flush=True)
        time_variant(f"BAR {st} barrier-chunked 512",
                     jax.jit(chunked_barrier), a, b512, K)

    print("probe_r5j done", flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception:
        traceback.print_exc()
        sys.exit(1)
