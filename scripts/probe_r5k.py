"""probe_r5k — f8-storage TRSV: does the f8 GEMM-emitter embed unlock the
blocked-XLA route past the sweep's 121 GF/s?

BENCH_NOTES "f8-storage TRSV" de-scoped the blocked route for f8 on the
claim that XLA has no fast 8-bit slice+convert feed (the per-slice fused
convert is what gives bf16/f16 their 687/690 GF/s at 24576). But the GEMV
tier's round-3 finding (probe_r3b G, ops/gemv.py:129-136) is that XLA's f8
GEMM emitter streams A natively when the vector is embedded as column 0 of
an (width, 8) zero block — and the blocked TRSV panel update IS a matvec
over an f8 slice. If the embed carries over, f8 single-rhs TRSV should
land in the bf16 class (~0.5 ms at 24576), not 121 GF/s.

Variants (n = 12288, 24576; single rhs; upper; block = 512 like the
shipped blocked route). Speed rows use unit=True (the trsv_flops.csv
convention); error rows use unit=False — the trsv_error.csv convention,
because a unit-upper LU triangle is exponentially ill-conditioned (the
fp64 oracle itself overflows: runs 1-2's nan error column).

  S   shipped acc_trsv (Pallas sweep, native fp8 tile loads) — incumbent
  E8  blocked, panel f8 @ embed(x -> e4m3)  — pure-f8 GEMM emitter; the
      carried solution is quantized to e4m3 at each panel feed
  EB  blocked, panel f8 @ embed(x -> bf16)  — mixed-dtype dot_general, if
      XLA accepts it (probe_r3b G measured f8 and bf16 x-blocks identical
      in the GEMV emitter); x rounding at 2^-8 instead of 2^-4
  C   blocked, per-slice panel.astype(f32) @ x f32 — the de-scope claim
      (slow 8-bit convert feed), measured rather than assumed

plus the max rel error of every variant against an fp64 triangular solve
of the SAME e4m3-quantized operand (storage quantization excluded, so only
the variants' carry/feed rounding differs; the tier's end-to-end error
mode stays de-scoped — A's 2^-4 storage error dominates everything here).

MEASURED (v5e, bench_results/probe_r5k4.log — runs 1-3 in probe_r5k.log/
probe_r5k{2,3}.log had a nan oracle from the unit-upper convention and a
tunnel-transfer stall, both fixed here): the de-scope claim is DEAD. At
24576: sweep 123.4 GF/s -> blocked f32-cast feed 978.4 / library 980.4
(7.9x), at 12288: 118.8 -> 806-827 (7.0x). Arithmetic error (vs f64 of
the quantized operand, non-unit) is the f32 blocked route's inv-apply
class: 4.66e-5 vs the sweep's 3.37e-5 at 24576 — both negligible against
the e4m3 storage class the tier carries by definition. The GEMM-emitter
embeds were REJECTED despite +2% at 24576 (E8/EB 1002): E8's e4m3-carried
x overflows to nan, EB's bf16 carry costs 5.8e-2 error for that 2%.
ADOPTED: _use_small routes f8 single-rhs onto the blocked schedule
(zero new kernel code — the per-slice astype(f32) feed XLA now fuses).
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

BLOCK = 512
_HI = jax.lax.Precision.HIGHEST
_E4 = jnp.float8_e4m3fn


def blocked_f8(a, b, mode: str, unit: bool = True):
    """_trsv_small's schedule (upper, aligned n, no refine — f8 storage
    never qualifies for the f32-only refine gate) with the panel feed
    swapped per `mode`: 'e8' / 'eb' use the GEMM-emitter embed, 'cast' the
    per-slice f32 convert the de-scope claim calls slow."""
    n = a.shape[0]
    nb = n // BLOCK
    starts = [bi * BLOCK for bi in range(nb)]
    d = jnp.stack(
        [a[s: s + BLOCK, s: s + BLOCK] for s in starts]
    ).astype(jnp.float32)
    inv = trsvops._masked_tri_inverse(d, lower=False, unit=unit)
    b2 = b.astype(jnp.float32)
    xs = [None] * nb
    for bi in range(nb - 1, -1, -1):
        s0 = starts[bi]
        rhs = b2[s0: s0 + BLOCK]
        if bi + 1 < nb:
            lo_c = starts[bi + 1]
            panel = a[s0: s0 + BLOCK, lo_c:]
            xcat = jnp.concatenate([xs[bj] for bj in range(bi + 1, nb)])
            if mode == "cast":
                upd = jnp.matmul(
                    panel.astype(jnp.float32), xcat, precision=_HI
                )
            else:
                xdt = _E4 if mode == "e8" else jnp.bfloat16
                x8 = (jnp.zeros((xcat.shape[0], 8), xdt)
                      .at[:, 0].set(xcat.astype(xdt)))
                upd = jax.lax.dot_general(
                    panel, x8, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )[:, 0]
            rhs = rhs - upd
        xs[bi] = jnp.matmul(inv[bi], rhs, precision=_HI)
    return jnp.concatenate(xs)


def lu_master(max_n: int) -> np.ndarray:
    cache_dir = os.environ.get(
        "ACCBLAS_CACHE", os.path.expanduser("~/.cache/accblas_jit")
    )
    path = os.path.join(cache_dir, "lu64_seed42_n24576.npy")
    if os.path.exists(path):
        return np.load(path)[:max_n, :max_n]
    a64 = gen_mtx(MatrixInfo(max_n, max_n), seed=42)
    lu64, _ = scipy.linalg.lu_factor(a64)
    return lu64[:max_n, :max_n]


def gf_s(n: int, ms: float) -> float:
    return n * n / (ms * 1e-3) / 1e9


def time_variant(label, fn, a, b):
    def body(c, a_, b_):
        return fn(a_, jnp.clip(c, -1.0, 1.0).astype(b_.dtype))

    ms = benchmark_loop(body, b, args=(a, b))
    n = a.shape[0]
    print(f"{label}: {ms:.3f} ms = {gf_s(n, ms):.1f} GF/s", flush=True)
    return gf_s(n, ms)


def main():
    lu64 = lu_master(24576)
    b_all = np.asarray(
        gen_mtx(MatrixInfo(24576, 1), seed=43), np.float64
    ).reshape(-1)

    # e4m3fn has no inf: a raw astype of overflowing U-factor entries makes
    # nan (first run's error column). The accessor layer saturates on cast
    # (accessor/range.py) — match it by clipping to the e4m3 max first.
    # Quantize on the HOST (ml_dtypes) so the fp64 oracle needs no D2H of
    # the device operand (run 3 stalled >20 min on tunnel transfers), and
    # ship only the f8 bytes up (604 MB, not the 2.4 GB f32 image).
    a8_host = np.clip(lu64.astype(np.float32), -448.0, 448.0).astype(
        ml_dtypes.float8_e4m3fn)
    a8_full = jax.device_put(jnp.asarray(a8_host))
    jax.block_until_ready(a8_full)
    print("operand resident", flush=True)

    def variants(unit):
        return {
            # resident=False forces the Pallas sweep — the pre-round-5
            # route (this probe's adoption flipped the library gate, so
            # the incumbent needs the explicit flag now)
            "S  sweep (old route)": jax.jit(
                lambda a, b: trsvops.acc_trsv(a, b, "upper", unit,
                                              unstable_ok=True,
                                              resident=False)
            ),
            "L  library (new route)": jax.jit(
                lambda a, b: trsvops.acc_trsv(a, b, "upper", unit,
                                              unstable_ok=True)
            ),
            "E8 blocked f8-embed": jax.jit(
                lambda a, b: blocked_f8(a, b, "e8", unit)),
            "EB blocked bf16-embed": jax.jit(
                lambda a, b: blocked_f8(a, b, "eb", unit)),
            "C  blocked f32-cast": jax.jit(
                lambda a, b: blocked_f8(a, b, "cast", unit)),
        }

    for n in (12288, 24576):
        a8 = a8_full[:n, :n]
        jax.block_until_ready(a8)
        b32 = jax.device_put(jnp.asarray(b_all[:n], jnp.float32))

        # fp64 oracle on the SAME quantized operand — non-unit (the
        # trsv_error.csv convention; unit-upper overflows the oracle)
        a64q = a8_host[:n, :n].astype(np.float64)
        x64 = scipy.linalg.solve_triangular(
            a64q, b_all[:n], lower=False, unit_diagonal=False
        )
        ref = np.abs(x64).max()

        print(f"=== n={n} (upper, block={BLOCK})", flush=True)
        err_fns = variants(False)
        for label, fn in variants(True).items():
            try:
                x = np.asarray(
                    jax.block_until_ready(err_fns[label](a8, b32)), np.float64)
            except Exception as e:  # noqa: BLE001 — report and move on
                print(f"{label}: UNSUPPORTED ({type(e).__name__}: {e})",
                      flush=True)
                continue
            err = np.abs(x - x64).max() / ref
            time_variant(f"{label} n={n} (unit)", fn, a8, b32)
            print(f"{label} n={n}: rel err (non-unit) vs f64(quantized A)"
                  f" = {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
