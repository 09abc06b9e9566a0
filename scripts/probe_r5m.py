"""probe_r5m — block-size retune of the blocked-XLA route for f8 storage
(and a bf16 control) at n = 24576.

probe_r5k rerouted f8 single-rhs TRSV onto the blocked schedule at the
shipped block=512: 0.617 ms = 978 GF/s. That is only ~570 GB/s of
effective stream (f8 triangle 302 MB + 48 inverse blocks 50 MB f32) vs
bf16's 747 GB/s on the same schedule — so the f8 feed is NOT yet
stream-bound and the block size is the open lever:

  - bigger block: fewer sequential panel matvecs (48 -> 24 -> 12), but
    the hoisted inverse blocks grow as n*block*4 bytes of extra f32
    inv-apply reads per solve (50 MB at 512 -> 201 MB at 2048);
  - smaller block: cheaper inv-apply, more per-panel convert launches.

Variants: block in {256, 512, 768, 1024, 1536, 2048} on the f8-quantized
seed-42 LU triangle (upper/unit, the flops convention), plus bf16 storage
at {512, 1024} as a control (expected ~flat: already 84% of its byte
roofline). Error sanity at the winning block vs an fp64 solve of the SAME
quantized operand (non-unit, the error convention) — must stay in the
blocked inv-apply class (~5e-5), since block only changes the inversion
granularity.

Run AFTER campaign_r5l (single TPU process rule).
"""

import os
import sys

import ml_dtypes
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

N = 24576


def lu_master(max_n: int) -> np.ndarray:
    cache_dir = os.environ.get(
        "ACCBLAS_CACHE", os.path.expanduser("~/.cache/accblas_jit")
    )
    path = os.path.join(cache_dir, "lu64_seed42_n24576.npy")
    return np.load(path)[:max_n, :max_n]


def gf_s(n: int, ms: float) -> float:
    return n * n / (ms * 1e-3) / 1e9


def time_one(label, fn, a, b):
    def body(c, a_, b_):
        return fn(a_, jnp.clip(c, -1.0, 1.0).astype(b_.dtype))

    ms = benchmark_loop(body, b, args=(a, b))
    print(f"{label}: {ms:.3f} ms = {gf_s(a.shape[0], ms):.1f} GF/s",
          flush=True)
    return ms


def main():
    lu64 = lu_master(N)
    b64 = np.asarray(gen_mtx(MatrixInfo(1, N), seed=43), np.float64)[0]

    a8_host = np.clip(lu64.astype(np.float32), -448.0, 448.0).astype(
        ml_dtypes.float8_e4m3fn)
    a8 = jax.device_put(jnp.asarray(a8_host))
    ab = jax.device_put(jnp.asarray(lu64.astype(ml_dtypes.bfloat16)))
    b32 = jax.device_put(jnp.asarray(b64, jnp.float32))
    jax.block_until_ready((a8, ab, b32))
    print("operands resident", flush=True)

    def small(block, unit=True):
        return jax.jit(lambda a, b: trsvops._trsv_small(
            a, b, "upper", unit, "f32", block=block))

    print(f"=== f8e4m3 storage, n={N}", flush=True)
    for blk in (256, 512, 768, 1024, 1536, 2048):
        time_one(f"f8 block={blk}", small(blk), a8, b32)
    print(f"=== bf16 storage control, n={N}", flush=True)
    for blk in (512, 1024):
        time_one(f"bf16 block={blk}", small(blk), ab, b32)

    # error sanity (non-unit, vs f64 of the quantized operand) at each
    # candidate block — the inv-apply class must hold
    a64q = a8_host.astype(np.float64)
    x64 = scipy.linalg.solve_triangular(a64q, b64, lower=False,
                                        unit_diagonal=False)
    ref = np.abs(x64).max()
    for blk in (512, 1024, 2048):
        x = np.asarray(jax.block_until_ready(
            small(blk, unit=False)(a8, b32)), np.float64)
        print(f"f8 block={blk}: rel err (non-unit) vs f64(quantized A) = "
              f"{np.abs(x - x64).max() / ref:.3e}", flush=True)


if __name__ == "__main__":
    main()
