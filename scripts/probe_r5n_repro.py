"""Minimal repro for the probe_r5n stall: f8 n=4096 block=512 blocked-route
solve, with each stage (upload, slice, AOT compile, execute) printed and
synced separately so the hanging stage is identified.

Uploads ONLY the f32 image and derives f8 on device (the driver's pattern,
trsv_benchmark.py:110-114) to rule the host-side multi-image upload out.
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

common.enable_compile_cache()

N = 4096


def stamp(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def lu_master(max_n):
    cache_dir = os.environ.get(
        "ACCBLAS_CACHE", os.path.expanduser("~/.cache/accblas_jit"))
    return np.load(os.path.join(cache_dir, "lu64_seed42_n24576.npy"))[
        :max_n, :max_n]


def main():
    lu64 = lu_master(N)
    b64 = np.asarray(gen_mtx(MatrixInfo(1, N), seed=43), np.float64)[0]
    stamp("host data ready")

    a32 = jax.device_put(jnp.asarray(lu64, jnp.float32))
    b32 = jax.device_put(jnp.asarray(b64, jnp.float32))
    jax.block_until_ready((a32, b32))
    stamp("f32 image uploaded")

    a8 = jax.block_until_ready(a32.astype(jnp.float8_e4m3fn))
    stamp("f8 derived on device")
    np.asarray(jnp.ravel(a8)[:1])
    stamp("f8 D2H sync done")

    fn = jax.jit(lambda a, b: trsvops._trsv_small(
        a, b, "upper", True, "f32", block=512))
    lowered = fn.lower(a8, b32)
    stamp("lowered")
    compiled = lowered.compile()
    stamp("compiled")

    x = compiled(a8, b32)
    np.asarray(jnp.ravel(x)[:1])
    stamp("executed + synced")

    t0 = time.perf_counter()
    for _ in range(5):
        x = compiled(a8, b32)
    np.asarray(jnp.ravel(x)[:1])
    stamp(f"5 more solves: {(time.perf_counter() - t0) * 1e3:.1f} ms total")


if __name__ == "__main__":
    main()
