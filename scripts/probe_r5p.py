"""probe_r5p — two open edges of the round-5 narrow-storage block retune
(probe_r5m/r5n, ops/trsv.py `_small_block_for`).

A. Crossover: the retune gate sits at _NARROW_BLOCK_N=4096 because 4096 was
   the smallest probed size (1024 already wins big there: f8 862 vs 606).
   The per-slice regime starts just above RESIDENT_N=2048, so n in
   {2176, 2560, 3072, 3584} x {512, 1024} (bf16 + f8) pins where the
   crossover actually is. If 1024 wins at 2176 too, the gate moves to
   n > RESIDENT_N.

B. Narrow multi-rhs routing (2 <= k < 32): `_use_small` currently sends
   narrow-storage panels with 1 < k < 32 to the fused Pallas sweep (the
   k>=32 wide-panel gate and the k==1 single-rhs gate bracket them).
   probe_r3g only probed f32 at k=16 (tie). For NARROW storage the blocked
   route streams the triangle at storage width via the fused slice+convert
   feed — the same effect that made single-rhs f8 7-8x faster (probe_r5k).
   Measure bf16/f8 at n=16384, k in {8, 16}: production route (acc_trsm,
   rides the sweep) vs _trsv_small at block 512 and 1024. If blocked wins
   clearly, extend the gate's k==1 condition to k < 32 for narrow storage.

Operands are on-device astype casts of one f32 upload; slices eager,
outside the timed jit (probe_r5n stall note, CLAUDE.md).

Run AFTER campaign_r5o (single TPU process rule).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from accblas_tpu.bench import common
from accblas_tpu.ops import trsv as trsvops
from accblas_tpu.utils import MatrixInfo, gen_mtx
from accblas_tpu.utils.bench import benchmark_loop

common.enable_compile_cache()

NMAX = 16384


def lu_master(max_n: int) -> np.ndarray:
    cache_dir = os.environ.get(
        "ACCBLAS_CACHE", os.path.expanduser("~/.cache/accblas_jit")
    )
    path = os.path.join(cache_dir, "lu64_seed42_n24576.npy")
    return np.load(path)[:max_n, :max_n]


def stamp(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def time_one(label, n, k, fn, a, b):
    an = a[:n, :n]
    bn = b[:n] if k == 1 else b[:n, :k]

    def body(c, a_):
        return fn(a_, jnp.clip(c, -1.0, 1.0))

    ms = benchmark_loop(body, bn, args=(an,))
    stamp(f"{label}: {ms:.3f} ms = {n * n * k / (ms * 1e-3) / 1e9:.1f} GF/s")
    return ms


def main():
    lu64 = lu_master(NMAX)
    b64 = np.asarray(gen_mtx(MatrixInfo(16, NMAX), seed=43), np.float64).T

    a32 = jax.device_put(jnp.asarray(lu64, jnp.float32))
    bm32 = jax.device_put(jnp.asarray(b64, jnp.float32))  # (NMAX, 16)
    jax.block_until_ready((a32, bm32))
    ab = a32.astype(jnp.bfloat16)
    a8 = a32.astype(jnp.float8_e4m3fn)
    b32 = bm32[:, 0]
    np.asarray(jnp.ravel(b32)[:1])
    stamp("operands resident")

    def small(block):
        return jax.jit(lambda a, b: trsvops._trsv_small(
            a, b, "upper", True, "f32", block=block))

    print("=== A. crossover (single-rhs, 512 vs 1024)", flush=True)
    for name, a in (("bf16", ab), ("f8", a8)):
        for n in (2176, 2560, 3072, 3584):
            for blk in (512, 1024):
                time_one(f"{name} n={n} block={blk}", n, 1, small(blk), a, b32)

    print("=== B. narrow multi-rhs (n=16384, k in {8,16})", flush=True)
    routed = jax.jit(lambda a, b: trsvops.acc_trsm(
        a, b, "upper", True, unstable_ok=True))
    for name, a in (("bf16", ab), ("f8", a8)):
        for k in (8, 16):
            time_one(f"{name} k={k} routed(sweep)", 16384, k, routed, a, bm32)
            for blk in (512, 1024):
                time_one(f"{name} k={k} blocked b={blk}", 16384, k,
                         small(blk), a, bm32)


if __name__ == "__main__":
    main()
