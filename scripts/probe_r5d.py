"""probe_r5d — df64 TRSM ceiling decomposition (round-4 VERDICT #2 closure).

probe_r5b adopted the blocked-XLA DF-carried route (_trsm_small_df64,
refine) over the Mosaic sweep: 13.5/14.5 TF/s at 16384/4096 vs 10.3/13.2.
That is still 0.54-0.69x the fixed f32 tier, short of the 0.8x target, so
this probe measures WHERE the remaining gap lives and what the schedule's
ceiling actually is:

  E   fixed f32 trsm            — the denominator (1 HIGHEST GEMM/panel)
  L   shipped acc_trsm df64     — refine, post cl-drop (3 refine GEMMs)
  L0  norefine                  — isolates the refine cost
  G1  feedforward f32 GEMMs     — the panel schedule's GEMM sequence with
      the solve dependencies cut (xs replaced by constants): the pure
      MXU+stream cost of the f32 blocked schedule
  G2  feedforward df64 GEMMs    — same sequence with the DF second pass
      (hi HIGHEST + lo default) and per-block DF folds: the irreducible
      cost of carrying a DF pair through this schedule — the measured
      ceiling for ANY DF-carried blocked TRSM on it

Ceiling claim: t(G2) lower-bounds any DF-carried variant; G2/G1 is the
schedule's intrinsic df64/f32 ratio; L0/G2 shows how much the real solve
loses to dependency serialization on top of that.

Usage (single TPU process!):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_r5d.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from accblas_tpu.bench import common
from accblas_tpu.ops import df64 as dfm
from accblas_tpu.ops import trsv as trsvops
from accblas_tpu.utils import MatrixInfo, gen_mtx
from accblas_tpu.utils.bench import benchmark_loop

common.enable_compile_cache()

K = 128
_HI = jax.lax.Precision.HIGHEST


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


def feedforward(a, b, df: bool):
    """The _trsm_small_df64 GEMM sequence with solve dependencies cut:
    every "solved panel" operand is a slice of b itself (constant w.r.t.
    the chain), so XLA issues the same panel/diagonal GEMMs without the
    block-to-block serialization. Measures the schedule's GEMM+fold SOL."""
    n = a.shape[0]
    block = trsvops._block_for(n)
    nb = n // block
    starts = [bi * block for bi in range(nb)]
    k = b.shape[1]
    acc_h = jnp.zeros((block, k), jnp.float32)
    acc_l = jnp.zeros((block, k), jnp.float32)
    for bi in range(nb - 1, -1, -1):
        s0 = starts[bi]
        done_w = n - (s0 + block)
        d = a[s0: s0 + block, s0: s0 + block]
        if done_w > 0:
            panel = a[s0: s0 + block, s0 + block:]
            xh = b[:done_w]  # stand-in solved panels (dependency cut)
            th = jnp.matmul(panel, xh, precision=_HI)
            if df:
                tl = jnp.matmul(panel, xh)
                r = dfm.df_add(dfm.df_from(th), dfm.df_from(tl))
                vh = jnp.matmul(d, r.hi, precision=_HI)
                vl = jnp.matmul(d, r.lo)
                xb = dfm.df_add(dfm.df_from(vh), dfm.df_from(vl))
                s = dfm.df_add(dfm.DF(acc_h, acc_l), xb)
                acc_h, acc_l = s.hi, s.lo
            else:
                vh = jnp.matmul(d, th, precision=_HI)
                acc_h = acc_h + vh
        else:
            vh = jnp.matmul(d, b[:block], precision=_HI)
            acc_h = acc_h + vh
    return acc_h + acc_l


def tf_s(n: int, ms: float) -> float:
    return n * n * K / (ms * 1e-3) / 1e12


def time_variant(label, fn, a, b, n):
    def body(c, a_, b_):
        r = fn(a_, jnp.clip(c, -1.0, 1.0).astype(b_.dtype))
        if r.shape == c.shape:
            return r
        # feedforward variants return one (block, k) accumulator — fold a
        # result element back into the carried operand to keep the chain
        return c.at[0, 0].add(r[0, 0].astype(c.dtype) * 1e-30)

    ms = benchmark_loop(body, b, args=(a, b))
    print(f"{label}: {ms:.3f} ms = {tf_s(n, ms):.2f} TF/s", flush=True)
    return ms


def main():
    lu64 = lu_master(16384)
    b64 = np.asarray(gen_mtx(MatrixInfo(16384, K), seed=43))

    for n in (4096, 16384):
        a32 = jax.device_put(np.array(lu64[:n, :n], np.float32))
        b32 = jax.device_put(b64[:n].astype(np.float32))
        jax.block_until_ready((a32, b32))
        print(f"=== n={n} k={K} (upper/unit)", flush=True)

        t = {}
        t["E"] = time_variant(
            f"E f32 fixed n={n}",
            jax.jit(lambda a, b: trsvops.trsm(a, b, "upper", True)),
            a32, b32, n)
        t["L"] = time_variant(
            f"L shipped df64 (refine, cl-drop) n={n}",
            jax.jit(lambda a, b: trsvops.acc_trsm(
                a, b, "upper", True, ar="df64")),
            a32, b32, n)
        t["L0"] = time_variant(
            f"L0 norefine n={n}",
            jax.jit(lambda a, b: trsvops._trsm_small_df64(
                a, b, "upper", True, "f32", refine=False)),
            a32, b32, n)
        if n >= 8192:
            # block retune candidates for the wide-panel blocked routes:
            # fewer, bigger GEMMs per step (the 512 default was tuned on
            # the SWEEP schedule, probe_r3b — never on this one)
            t["E1024"] = time_variant(
                f"E1024 f32 blocked block=1024 n={n}",
                jax.jit(lambda a, b: trsvops._trsv_small(
                    a, b, "upper", True, "f32", block=1024)),
                a32, b32, n)
            t["L1024"] = time_variant(
                f"L1024 df64 refine block=1024 n={n}",
                jax.jit(lambda a, b: trsvops._trsm_small_df64(
                    a, b, "upper", True, "f32", block=1024)),
                a32, b32, n)
        t["G1"] = time_variant(
            f"G1 feedforward f32 GEMMs n={n}",
            jax.jit(lambda a, b: feedforward(a, b, False)),
            a32, b32, n)
        t["G2"] = time_variant(
            f"G2 feedforward df64 GEMMs n={n}",
            jax.jit(lambda a, b: feedforward(a, b, True)),
            a32, b32, n)
        print(
            f"n={n}: shipped {t['E']/t['L']:.2f}x fixed | refine cost "
            f"{(t['L']-t['L0'])/t['L0']*100:.1f}% | schedule df64/f32 SOL "
            f"{t['G2']/t['G1']:.2f}x | L0 within {t['L0']/t['G2']:.2f}x of "
            f"G2 ceiling | E within {t['E']/t['G1']:.2f}x of G1",
            flush=True)
    # error: does block=1024 hold the error class? (bigger diagonal blocks
    # = worse inverse conditioning; df64 has refine to absorb it, the f32
    # wide route has none)
    import scipy.linalg

    n = 8192
    t64 = np.triu(np.array(lu64[:n, :n]))
    ref = scipy.linalg.solve_triangular(t64, b64[:n], lower=False,
                                        unit_diagonal=False)
    a32 = jax.device_put(np.array(lu64[:n, :n], np.float32))
    b32 = jax.device_put(b64[:n].astype(np.float32))
    print(f"=== n={n} error (upper/non-unit vs scipy fp64)", flush=True)

    def err(label, fn):
        x = np.asarray(jax.block_until_ready(jax.jit(fn)(a32, b32)),
                       np.float64)
        e = np.abs(x - ref).sum() / np.abs(ref).sum()
        print(f"{label}: err {e:.4e}", flush=True)

    err("E f32 block=512", lambda a, b: trsvops._trsv_small(
        a, b, "upper", False, "f32"))
    err("E1024 f32 block=1024", lambda a, b: trsvops._trsv_small(
        a, b, "upper", False, "f32", block=1024))
    err("L df64 refine block=512", lambda a, b: trsvops._trsm_small_df64(
        a, b, "upper", False, "f32"))
    err("L1024 df64 refine block=1024", lambda a, b: trsvops._trsm_small_df64(
        a, b, "upper", False, "f32", block=1024))
    print("probe_r5d done", flush=True)


if __name__ == "__main__":
    main()
