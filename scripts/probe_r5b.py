"""probe_r5b — blocked-XLA df64 TRSM prototype (round-4 VERDICT #2, part 2).

probe_r5a measured the fused Mosaic sweep's df64 TRSM time INVARIANT to
rhs grouping (1 vs 3 triangle streams), block size (512 vs 1024), and MXU
precision mode (HIGHEST vs HIGH): 10.3 TF/s at n=16384 k=128 under every
knob. The sweep is uniformly Mosaic-schedule-bound — meanwhile the fixed
f32 tier rides the blocked-XLA route at 24.8 TF/s on the SAME MXU work
(6-pass HIGHEST GEMMs). So the candidate is a blocked-XLA df64 TRSM:
the `_trsv_small` panel structure with the correction carried as a
double-float (hi, lo) pair in plain HLO — hi products at HIGHEST, lo
products at default (the lo term rides 2^-24 down, so 1 bf16 pass is
already below the product floor), per-block DF folds (exact two_sum) so
cross-block accumulation stays DF-exact like the sweep's VMEM carry.

Variants:
  S. shipped sweep df64     — the 10.3 TF/s incumbent
  P. blocked-XLA df64       — inv-apply diagonal solve (f32-inverse class)
  R. P + DF diagonal refine — one DF residual correction per diagonal
     block (2 extra block GEMMs, ~2*block/n of total flops) if P's error
     misses the sweep's 6.6e-6 class
  E. fixed f32              — the ratio denominator

Adoption criterion: >=0.8x fixed at 4096-16384 AND error <= the sweep
df64's (non-unit, vs scipy fp64).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_r5b.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import scipy.linalg

from accblas_tpu.bench import common
from accblas_tpu.ops import df64 as dfm
from accblas_tpu.ops import trsv as trsvops
from accblas_tpu.ops.common import tri_mask
from accblas_tpu.utils import MatrixInfo, gen_mtx
from accblas_tpu.utils.bench import benchmark_loop

common.enable_compile_cache()

K = 128
BLOCK = 512
_HI = jax.lax.Precision.HIGHEST


def df_trsm_blocked(a, b, lower: bool, unit: bool, refine: bool):
    """Blocked substitution, DF-carried, plain HLO. Aligned n only (probe)."""
    n = a.shape[0]
    nb = n // BLOCK
    starts = [bi * BLOCK for bi in range(nb)]
    d = jnp.stack([a[s: s + BLOCK, s: s + BLOCK] for s in starts])
    inv = trsvops._masked_tri_inverse(d, lower, unit)
    xs_hi = [None] * nb
    xs_lo = [None] * nb
    b2 = b.astype(jnp.float32)
    order = range(nb) if lower else range(nb - 1, -1, -1)
    for bi in order:
        s0 = starts[bi]
        rhs = dfm.df_from(b2[s0: s0 + BLOCK])
        done = list(range(bi)) if lower else list(range(bi + 1, nb))
        for bj in done:
            p = a[s0: s0 + BLOCK, starts[bj]: starts[bj] + BLOCK]
            th = jnp.matmul(p, xs_hi[bj], precision=_HI)
            tl = jnp.matmul(p, xs_lo[bj])
            rhs = dfm.df_add(rhs, dfm.df_from(-th))
            rhs = dfm.df_add(rhs, dfm.df_from(-tl))
        vh = jnp.matmul(inv[bi], rhs.hi, precision=_HI)
        vl = jnp.matmul(inv[bi], rhs.lo)
        xb = dfm.df_add(dfm.df_from(vh), dfm.df_from(vl))
        if refine:
            tb = tri_mask(a[s0: s0 + BLOCK, s0: s0 + BLOCK], lower, unit)
            rh = jnp.matmul(tb, xb.hi, precision=_HI)
            rl = jnp.matmul(tb, xb.lo)
            r = dfm.df_sub(rhs, dfm.df_add(dfm.df_from(rh), dfm.df_from(rl)))
            ch = jnp.matmul(inv[bi], r.hi, precision=_HI)
            cl = jnp.matmul(inv[bi], r.lo)
            xb = dfm.df_add(xb, dfm.df_add(dfm.df_from(ch), dfm.df_from(cl)))
        xs_hi[bi] = xb.hi
        xs_lo[bi] = xb.lo
    return jnp.concatenate(xs_hi), jnp.concatenate(xs_lo)


def lu_master(max_n: int) -> np.ndarray:
    cache_dir = os.environ.get(
        "ACCBLAS_CACHE", os.path.expanduser("~/.cache/accblas_jit")
    )
    path = os.path.join(cache_dir, "lu64_seed42_n24576.npy")
    if os.path.exists(path):
        return np.load(path)[:max_n, :max_n]
    a64 = gen_mtx(MatrixInfo(max_n, max_n), seed=42)
    lu64, _ = scipy.linalg.lu_factor(a64)
    return lu64


def tf_s(n: int, ms: float) -> float:
    return n * n * K / (ms * 1e-3) / 1e12


def time_variant(label, fn, a, b):
    def body(c, a_, b_):
        return fn(a_, jnp.clip(c, -1.0, 1.0).astype(b_.dtype))

    ms = benchmark_loop(body, b, args=(a, b))
    n = a.shape[0]
    print(f"{label}: {ms:.3f} ms = {tf_s(n, ms):.2f} TF/s", flush=True)
    return tf_s(n, ms)


def main():
    lu64 = lu_master(16384)
    b64 = gen_mtx(MatrixInfo(16384, K), seed=43)

    for n in (4096, 16384):
        a32 = jax.device_put(lu64[:n, :n].astype(np.float32))
        b32 = jax.device_put(b64[:n].astype(np.float32))
        jax.block_until_ready((a32, b32))
        print(f"=== n={n} k={K} speed (upper/unit)", flush=True)

        r = {}
        r["S"] = time_variant(
            f"S sweep df64 n={n}",
            jax.jit(lambda a, b: trsvops.acc_trsm(a, b, "upper", True, ar="df64")),
            a32, b32)
        r["P"] = time_variant(
            f"P blockedXLA df64 n={n}",
            jax.jit(lambda a, b: df_trsm_blocked(a, b, False, True, False)[0]),
            a32, b32)
        r["R"] = time_variant(
            f"R blockedXLA df64+refine n={n}",
            jax.jit(lambda a, b: df_trsm_blocked(a, b, False, True, True)[0]),
            a32, b32)
        # the LIBRARY generalization (commit 12bb7ca): concatenated-panel
        # GEMMs instead of the per-bj loop above — this is the code that
        # would ship, so the adoption decision reads THESE rows
        r["L"] = time_variant(
            f"L library _trsm_small_df64 refine n={n}",
            jax.jit(lambda a, b: trsvops._trsm_small_df64(
                a, b, "upper", True, "f32", refine=True)),
            a32, b32)
        r["L0"] = time_variant(
            f"L0 library _trsm_small_df64 norefine n={n}",
            jax.jit(lambda a, b: trsvops._trsm_small_df64(
                a, b, "upper", True, "f32", refine=False)),
            a32, b32)
        r["E"] = time_variant(
            f"E f32 fixed n={n}",
            jax.jit(lambda a, b: trsvops.trsm(a, b, "upper", True)),
            a32, b32)
        print(f"n={n}: sweep {r['S']/r['E']:.2f}x -> blocked "
              f"{r['P']/r['E']:.2f}x (refined {r['R']/r['E']:.2f}x), library "
              f"{r['L']/r['E']:.2f}x (norefine {r['L0']/r['E']:.2f}x)",
              flush=True)

    # error (upper/non-unit) at n=4096 and 8192 vs scipy fp64
    for n in (4096, 8192):
        t64 = np.triu(lu64[:n, :n])
        ref = scipy.linalg.solve_triangular(t64, b64[:n], lower=False,
                                            unit_diagonal=False)
        a32 = jax.device_put(lu64[:n, :n].astype(np.float32))
        b32 = jax.device_put(b64[:n].astype(np.float32))
        print(f"=== n={n} error (upper/non-unit vs scipy fp64)", flush=True)

        def err(label, fn):
            x = np.asarray(jax.block_until_ready(jax.jit(fn)(a32, b32)),
                           np.float64)
            e = np.abs(x - ref).sum() / np.abs(ref).sum()
            print(f"{label}: err {e:.4e}", flush=True)
            return e

        err("S sweep df64",
            lambda a, b: trsvops.acc_trsm(a, b, "upper", False, ar="df64"))
        err("P blockedXLA df64",
            lambda a, b: df_trsm_blocked(a, b, False, False, False)[0])
        err("R blockedXLA df64+refine",
            lambda a, b: df_trsm_blocked(a, b, False, False, True)[0])
        err("L library _trsm_small_df64 refine",
            lambda a, b: trsvops._trsm_small_df64(a, b, "upper", False, "f32",
                                                  refine=True))
        err("L0 library _trsm_small_df64 norefine",
            lambda a, b: trsvops._trsm_small_df64(a, b, "upper", False, "f32",
                                                  refine=False))
        err("E f32 fixed",
            lambda a, b: trsvops.trsm(a, b, "upper", False))
    print("probe_r5b done", flush=True)


if __name__ == "__main__":
    main()
