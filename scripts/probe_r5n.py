"""probe_r5n — size axis of the blocked-route block retune (follow-up to
probe_r5m).

probe_r5m (n = 24576 only) measured block=1024 beating the shipped 512 on
the blocked-XLA schedule for BOTH narrow tiers: f8 969 -> 1141 GF/s
(+18%), bf16 692 -> 746 (+7.8% — NOT flat; 746 = the bf16 GEMV stream
tier, so 512 was leaving bandwidth on the table). Error stays in the
inv-apply class (5.9e-5 at 1024; 1.46e-4 at 2048 which also loses speed).

Open questions this probe answers before retuning `_trsv_small`:
  1. Crossover: at which n does 1024 overtake 512 per dtype? The hoisted
     inverse stack grows as nb*block^2 f32 (same total n*block bytes), but
     the per-solve inv-apply read is n*block*4 B — at small n that term
     is a larger fraction of the n^2/2 storage-width triangle stream.
  2. Does f16 ride the same curve as bf16 (same width, same feed)?
  3. Ragged f32 at 24503 (the blocked route still owns ragged n >= 8192):
     info-only — f32 retune would invalidate the round-4 error captures,
     so the retune is gated to narrow storage; this row just records what
     a future round could take.

Grid: f8 {4096,8192,16384,24576} x {512,1024} + 768 at {16384,24576};
bf16 {4096,8192,16384,24576} x {512,1024}; f16 {8192,24576} x {512,1024};
f32 ragged 24503 x {512,1024}. Operands are device-resident leading-slice
views of the 24576 master (CLAUDE.md: never re-transfer what slices).

Run AFTER campaign_r5l / probe_r5m (single TPU process rule).
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

NMAX = 24576


def lu_master(max_n: int) -> np.ndarray:
    cache_dir = os.environ.get(
        "ACCBLAS_CACHE", os.path.expanduser("~/.cache/accblas_jit")
    )
    path = os.path.join(cache_dir, "lu64_seed42_n24576.npy")
    return np.load(path)[:max_n, :max_n]


def gf_s(n: int, ms: float) -> float:
    return n * n / (ms * 1e-3) / 1e9


def time_one(label, n, fn, a, b):
    # eager per-size views OUTSIDE the timed jit, exactly like the driver
    # (trsv_benchmark.py:195-199). The operands MUST be on-device-derived
    # casts of the f32 upload: both earlier r5n attempts device_put
    # host-quantized f8/bf16 images and stalled 20-33 min at 0% CPU on the
    # first eager f8 slice (the staged repro, probe_r5n_repro.py, isolated
    # the pathology to eager ops on host-uploaded f8 — the same blocked
    # program compiles in 3 s and solves in ms once the operand is an
    # on-device astype of the f32 image, which is the driver's pattern).
    an = a[:n, :n]
    bn = b[:n]

    def body(c, a_):
        return fn(a_, jnp.clip(c, -1.0, 1.0))

    ms = benchmark_loop(body, bn, args=(an,))
    print(f"[{time.strftime('%H:%M:%S')}] {label}: {ms:.3f} ms = "
          f"{gf_s(n, ms):.1f} GF/s", flush=True)
    return ms


def main():
    lu64 = lu_master(NMAX)
    b64 = np.asarray(gen_mtx(MatrixInfo(1, NMAX), seed=43), np.float64)[0]

    # upload ONLY the f32 image; derive every storage tier on device
    # (trsv_benchmark.py:110-114) — see the stall note in time_one
    a32 = jax.device_put(jnp.asarray(lu64, jnp.float32))
    b32 = jax.device_put(jnp.asarray(b64, jnp.float32))
    jax.block_until_ready((a32, b32))
    ab = a32.astype(jnp.bfloat16)
    ah = a32.astype(jnp.float16)
    a8 = a32.astype(jnp.float8_e4m3fn)
    # sync through an f32 D2H read (f8 scalar reads are themselves the
    # pathological path; never ravel/read the 8-bit arrays)
    np.asarray(jnp.ravel(b32)[:1])
    print(f"[{time.strftime('%H:%M:%S')}] operands resident", flush=True)

    def small(n, block):
        return jax.jit(lambda a, b: trsvops._trsv_small(
            a, b, "upper", True, "f32", block=block))

    grids = [
        ("f8", a8, [(4096, (512, 1024)), (8192, (512, 1024)),
                    (16384, (512, 768, 1024)), (24576, (768, 1024))]),
        ("bf16", ab, [(4096, (512, 1024)), (8192, (512, 1024)),
                      (16384, (512, 1024)), (24576, (1024,))]),
        ("f16", ah, [(8192, (512, 1024)), (24576, (512, 1024))]),
        ("f32-ragged", a32, [(24503, (512, 1024))]),
    ]
    for name, a, rows in grids:
        print(f"=== {name}", flush=True)
        for n, blocks in rows:
            for blk in blocks:
                time_one(f"{name} n={n} block={blk}", n, small(n, blk), a, b32)


if __name__ == "__main__":
    main()
