"""probe_r5a — TRSM df64 storage-speed gap (round-4 VERDICT #2).

The fused one-pass df64 TRSM sits at 0.41-0.63x the fixed-f32 tier
(trsm_flops.csv: 10.2 vs 24.9 TF/s at n=16384, k=128) where TRSV reaches
0.95x. Diagnosis: `_trsm_impl` splits wide right-hand-side panels into
groups bounded by `_TRSM_SCR_BYTES` (6 MiB) — at n=16384 the df64 (hi, lo)
scratch caps the group at 48 rhs, so k=128 re-streams the whole triangle
3x. The v5e VMEM budget (the sweep already compiles with
vmem_limit_bytes=64 MiB) has room for the full-k scratch (16 MiB at
16384/128 df64) — this probe measures whether a single fused group
actually recovers the re-streamed bandwidth, plus two secondary knobs:

  A. baseline       — shipped routing (scr 6 MiB -> 3 groups at 16384)
  B. scr 32 MiB     — single group (the fused multi-group carry)
  C. B + BLOCK 1024 — halves sweep steps; leaf stays 64
  D. B + hi-dot HIGH — the update's x_hi·A at 3 MXU passes instead of
     HIGHEST's 6 (the lo·A pass already runs default). Speed AND error:
     adopt only if the df64 error column keeps a clear margin under f32.
  E. fixed f32      — the ratio denominator, same session

Error rows run non-unit (unit-upper LU triangles are exponentially
ill-conditioned — the driver's own guidance) at n=4096 vs a scipy fp64
solve. Speed rows run the trsm_flops capture mode (upper/unit).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_r5a.py
       (TPU; strictly one process on the chip)
"""

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import scipy.linalg

from accblas_tpu.bench import common
from accblas_tpu.ops import trsv as trsvops
from accblas_tpu.utils import MatrixInfo, gen_mtx
from accblas_tpu.utils.bench import benchmark_loop

common.enable_compile_cache()

K = 128
UPLO = "upper"


def lu_master(max_n: int) -> np.ndarray:
    cache_dir = os.environ.get(
        "ACCBLAS_CACHE", os.path.expanduser("~/.cache/accblas_jit")
    )
    path = os.path.join(cache_dir, f"lu64_seed42_n24576.npy")
    if os.path.exists(path):
        return np.load(path)[:max_n, :max_n]
    a64 = gen_mtx(MatrixInfo(max_n, max_n), seed=42)
    lu64, _ = scipy.linalg.lu_factor(a64)
    return lu64


def tf_s(n: int, ms: float) -> float:
    return n * n * K / (ms * 1e-3) / 1e12


def time_variant(label, fn, a, b):
    """Chained-loop timing (x feeds the next rhs) — the trsv driver's body."""
    def body(c, a_, b_):
        return fn(a_, jnp.clip(c, -1.0, 1.0).astype(b_.dtype))

    ms = benchmark_loop(body, b, args=(a, b))
    n = a.shape[0]
    print(f"{label}: {ms:.3f} ms = {tf_s(n, ms):.2f} TF/s", flush=True)
    return tf_s(n, ms)


def err_variant(label, fn, a, b, ref):
    x = np.asarray(jax.block_until_ready(fn(a, b)), np.float64)
    e = np.abs(x - ref).sum() / np.abs(ref).sum()
    print(f"{label}: err {e:.4e}", flush=True)
    return e


def main():
    lu64 = lu_master(16384)
    b64 = gen_mtx(MatrixInfo(16384, K), seed=43)

    results = {}
    for n in (4096, 16384):
        a32 = jax.device_put(lu64[:n, :n].astype(np.float32))
        b32 = jax.device_put(b64[:n].astype(np.float32))
        jax.block_until_ready((a32, b32))
        print(f"=== n={n} k={K} (upper/unit speed rows)", flush=True)

        def df(a, b):
            return trsvops.acc_trsm(a, b, UPLO, True, ar="df64")

        def f32(a, b):
            return trsvops.trsm(a, b, UPLO, True)

        # A: baseline
        trsvops._TRSM_SCR_BYTES = 6 * 2**20
        results[f"A df64 base n={n}"] = time_variant(
            f"A df64 scr6MiB n={n}", jax.jit(df), a32, b32)
        # B: single fused group
        trsvops._TRSM_SCR_BYTES = 32 * 2**20
        results[f"B df64 scr32 n={n}"] = time_variant(
            f"B df64 scr32MiB n={n}", jax.jit(df), a32, b32)
        # C: B + BLOCK 1024
        trsvops.BLOCK = 1024
        results[f"C df64 scr32 blk1024 n={n}"] = time_variant(
            f"C df64 scr32MiB blk1024 n={n}", jax.jit(df), a32, b32)
        trsvops.BLOCK = 512
        # D: B + hi-dot HIGH
        trsvops._HI = jax.lax.Precision.HIGH
        results[f"D df64 scr32 HIGH n={n}"] = time_variant(
            f"D df64 scr32MiB hiHIGH n={n}", jax.jit(df), a32, b32)
        trsvops._HI = jax.lax.Precision.HIGHEST
        # E: fixed f32 denominator (blocked-XLA route)
        trsvops._TRSM_SCR_BYTES = 6 * 2**20
        results[f"E f32 fixed n={n}"] = time_variant(
            f"E f32 fixed n={n}", jax.jit(f32), a32, b32)

        ratio_a = results[f"A df64 base n={n}"] / results[f"E f32 fixed n={n}"]
        ratio_b = results[f"B df64 scr32 n={n}"] / results[f"E f32 fixed n={n}"]
        print(f"n={n}: df64/f32 baseline {ratio_a:.2f}x -> fused {ratio_b:.2f}x",
              flush=True)

    # error rows: non-unit upper at n=4096 vs scipy fp64
    n = 4096
    t64 = np.triu(lu64[:n, :n])
    ref = scipy.linalg.solve_triangular(t64, b64[:n], lower=False,
                                        unit_diagonal=False)
    a32 = jax.device_put(lu64[:n, :n].astype(np.float32))
    b32 = jax.device_put(b64[:n].astype(np.float32))
    print(f"=== n={n} error rows (upper/non-unit vs scipy fp64)", flush=True)

    def dfn(a, b):
        return trsvops.acc_trsm(a, b, UPLO, False, ar="df64")

    def f32n(a, b):
        return trsvops.trsm(a, b, UPLO, False)

    trsvops._TRSM_SCR_BYTES = 32 * 2**20
    e_b = err_variant("B df64 scr32", jax.jit(dfn), a32, b32, ref)
    trsvops._HI = jax.lax.Precision.HIGH
    e_d = err_variant("D df64 scr32 hiHIGH", jax.jit(dfn), a32, b32, ref)
    trsvops._HI = jax.lax.Precision.HIGHEST
    trsvops._TRSM_SCR_BYTES = 6 * 2**20
    e_f = err_variant("E f32 fixed", jax.jit(f32n), a32, b32, ref)
    print(f"err margin: df64 {e_b:.3e} / HIGH {e_d:.3e} / f32 {e_f:.3e}",
          flush=True)
    print("probe_r5a done", flush=True)


if __name__ == "__main__":
    main()
