"""GEMV kernels: res = alpha * A @ x + beta * res.

TPU-native rebuild of the reference's GEMV family (``cuda/gemv_kernels.cuh``):

- ``kernel::gemv`` (one thread block per row, threads striding columns with a
  shared-memory reduce, ``cuda/gemv_kernels.cuh:30-64``) becomes a Pallas
  kernel over a (row-block × column-block) grid. Per step the MXU contracts an
  (BM, BN) tile of A against the x column block — the systolic array replaces
  the per-row reduction tree — with partials carried in a VMEM scratch across
  the column grid dimension and the alpha/beta epilogue applied on the last
  column step (the thread-0 epilogue analogue, ``cuda/gemv_kernels.cuh:56-63``
  including the beta == 0 special case).
- ``kernel::acc_gemv`` (``cuda/gemv_kernels.cuh:79-113``) is the accessor
  tier. For f32 arithmetic over bf16/f32 storage the cast-on-load is folded
  into the MXU via ``preferred_element_type`` — same semantics as an explicit
  upcast, zero extra ops. For df64 arithmetic the kernel runs on the VPU with
  error-compensated row folds (ops.df64.cascaded_fold_mid).
- ``cublas_gemv`` (``cuda/gemv_kernels.cuh:198-243``) maps to `xla_gemv`.
  The reference needs CUBLAS_OP_T because its storage is row-major; XLA takes
  row-major natively.

alpha/beta ride in SMEM as (1,1) scalars (runtime values, like the reference's
kernel arguments — not trace-time constants).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accessor import dtypes
from ..accessor.range import Range, ReducedRowMajor
from . import df64 as dfm
from .common import compiler_params, interpret_default, pow2_ceil

BM_MAX = 1024  # row-block (measured +2% over 512 for bf16 at 16384^2)
BN_MAX = 1024  # column-block
# fixed-tier chunk chains in the fullrow kernel. Sequential depth k/chains
# sets the plain-f32 accumulation term, but it is NOT the dominant error:
# measured (CPU, n=4096) 2/4/8/16 chains = 1.18/1.09/1.08/1.17e-7 — the
# storage-rounding floor (~9.4e-8) dominates, so more chains buy <9% error
# for real perf risk. 2 stays the shipped value.
FIXED_CHAINS = 2

# below this matrix size XLA keeps operands VMEM-resident across repeated
# calls while a Pallas kernel re-streams HBM (see ops.dot.RESIDENT_BYTES);
# the small mode expresses the same tier algorithm in jnp ops
RESIDENT_BYTES = 16 * 2**20


_F8 = (jnp.float8_e4m3fn, jnp.float8_e5m2)
_NARROW = (jnp.bfloat16, jnp.float16)


def _mxu_operands(av_raw, xv, ar: str):
    """Pick MXU operand dtypes + precision for the cast-on-load contraction.

    - same-dtype narrow (bf16/f16/f8) pairs under f32 arithmetic: feed the
      MXU raw — the systolic array upcasts exactly (zero extra ops). For f8
      this matters doubly: materializing a bf16 copy of the n² matrix costs
      1 read + 2 write + 2 re-read bytes/elem against the raw feed's 1
      (round-2 measured 1042 GF/s = 64% of the f8 roofline via the bf16
      copy; ops.dot's raw f8 feed reaches 91% — route GEMV identically).
    - mixed narrow pairs (e4m3 × bf16 etc.): upcast the f8 side to bf16,
      which is EXACT for both e4m3 (4-bit exp ⊂ 8, 3-bit mant ⊂ 7) and e5m2.
    - f32 operands: HIGHEST (the TPU default truncates f32 dot operands to
      bf16, which would falsify the f32 tier's label).

    Returns (a, x, precision) where precision == "native" marks the raw-feed
    case.
    """
    ar_dt = dtypes.jnp_dtype(ar)
    if ar == "f32":
        if av_raw.dtype == xv.dtype and av_raw.dtype in _NARROW + _F8:
            return av_raw, xv, "native"
        # f16 excluded here: f16 -> bf16 drops mantissa bits (10 > 7)
        if av_raw.dtype in _F8 + (jnp.bfloat16,) and xv.dtype in _F8 + (jnp.bfloat16,):
            return av_raw.astype(jnp.bfloat16), xv.astype(jnp.bfloat16), "native"
    av = av_raw if av_raw.dtype == ar_dt else av_raw.astype(ar_dt)
    xa = xv if xv.dtype == ar_dt else xv.astype(ar_dt)
    prec = jax.lax.Precision.HIGHEST if ar_dt == jnp.float32 else None
    return av, xa, prec


def _gemv_small(a, x, res, alpha, beta, ar: str, precise: bool, st_out: str,
                df_out: bool = False):
    """XLA-composed small GEMV with identical tier semantics."""
    m, n = a.shape
    rv = jnp.where(
        beta == 0.0,
        jnp.zeros((m,), jnp.float32),
        res.astype(jnp.float32) * jnp.float32(beta),
    )
    if ar == "df64":
        xa = x.astype(jnp.float32)
        av = a.astype(jnp.float32)
        if precise:
            p, e = dfm.two_prod(av, xa[None, :])
        else:
            p, e = av * xa[None, :], None
        # exact two_sum halving over the column axis (compensated, flat error)
        err = e
        s = p
        while s.shape[1] > 1:
            half = s.shape[1] // 2
            s_new, e2 = dfm.two_sum(s[:, :half], s[:, half : 2 * half])
            err_new = e2 if err is None else err[:, :half] + err[:, half : 2 * half] + e2
            if s.shape[1] % 2:
                s0, e0 = dfm.two_sum(s_new[:, :1], s[:, 2 * half :])
                err0 = err_new[:, :1] + e0 + (
                    err[:, 2 * half :] if err is not None else 0.0
                )
                s_new = jnp.concatenate([s0, s_new[:, 1:]], 1)
                err_new = jnp.concatenate([err0, err_new[:, 1:]], 1)
            s, err = s_new, err_new
        if err is None:  # n == 1: the halving loop never ran (fast mode)
            err = jnp.zeros_like(s)
        tot = dfm.DF(s[:, 0], err[:, 0])
        out = dfm.df_add(dfm.df_mul_f32(tot, jnp.float32(alpha)), dfm.df_from(rv))
        if df_out:
            return out
        return dfm.df_to_f32(out).astype(dtypes.jnp_dtype(st_out))
    ar_dt = dtypes.jnp_dtype(ar)
    av, xa, prec = _mxu_operands(a, x, ar)
    if prec == "native" and av.dtype in _F8:
        # XLA's f8 *matvec* emitter stalls at 1041 GF/s (64% of the f8
        # roofline) while its f8 GEMM emitter streams A natively: embed x as
        # column 0 of an (n, 8) zero block so the (m, 8) output engages the
        # GEMM path — measured 1356 GF/s at 24576² (probe_r3b G; the extra
        # columns are exact zeros, the x/out padding is O(n) traffic)
        x2 = jnp.zeros((xa.shape[0], 8), av.dtype).at[:, 0].set(xa)
        val = jnp.matmul(av, x2, preferred_element_type=jnp.float32)[:, 0]
    elif prec == "native":
        val = jnp.matmul(av, xa, preferred_element_type=jnp.float32)
    else:
        val = jnp.matmul(
            av, xa, precision=prec, preferred_element_type=jnp.float32
        ).astype(ar_dt)
    out = val.astype(jnp.float32) * jnp.float32(alpha) + rv
    return out.astype(dtypes.jnp_dtype(ar)).astype(dtypes.jnp_dtype(st_out))


def _gemv_kernel(
    alpha_ref,
    beta_ref,
    a_ref,
    x_ref,
    r_ref,
    o_ref,
    acc_hi,
    acc_lo,
    *,
    ar: str,
    st_out: str,
    n_total: int,
    bn: int,
    n_steps_j: int,
    precise: bool,
    spec_a: ReducedRowMajor,
    spec_x: ReducedRowMajor,
    spec_out: ReducedRowMajor,
):
    j = pl.program_id(1)
    ragged_n = n_total % bn != 0

    @pl.when(j == 0)
    def _init():
        acc_hi[...] = jnp.zeros_like(acc_hi)
        if acc_lo is not None:
            acc_lo[...] = jnp.zeros_like(acc_lo)

    # kernel body written against ranges (reference acc_gemv pattern,
    # cuda/gemv_kernels.cuh:79-113); raw loads feed the MXU/df64-carrier
    # cast-on-load (Range.load_raw docstring — same semantics, zero extra
    # bandwidth), the store casts back to the output's storage type
    ra = Range(spec_a, a_ref, const=True)
    rx = Range(spec_x, x_ref, const=True)
    ro = Range(spec_out, o_ref)
    xv = rx.load_raw()  # df64: (1, BN) row; MXU paths: (BN, 1) column
    av_raw = ra.load_raw()
    if ragged_n:
        # out-of-bounds tail blocks read unspecified values (possibly NaN/inf,
        # which would poison the contraction even against masked-zero x) —
        # zero both operands past n
        valid = n_total - j * bn
        x_col_axis = 1 if ar == "df64" else 0
        colid = jax.lax.broadcasted_iota(jnp.int32, xv.shape, x_col_axis)
        xv = jnp.where(colid < valid, xv, jnp.zeros((), xv.dtype))
        acolid = jax.lax.broadcasted_iota(jnp.int32, av_raw.shape, 1)
        av_raw = jnp.where(acolid < valid, av_raw, jnp.zeros((), av_raw.dtype))

    if ar == "df64":
        av = av_raw.astype(jnp.float32)  # cast-on-load
        xa = xv.astype(jnp.float32)
        if precise:
            p, e = dfm.two_prod(av, xa)
        else:
            p, e = av * xa, None
        bm = p.shape[0]
        part = dfm.cascaded_fold_mid(
            p.reshape(bm, bn // 128, 128),
            err=None if e is None else e.reshape(bm, bn // 128, 128),
        )  # DF (BM, 128)
        acc = dfm.df_add(dfm.DF(acc_hi[...], acc_lo[...]), part)
        acc_hi[...] = acc.hi
        acc_lo[...] = acc.lo
    else:
        ar_dt = dtypes.jnp_dtype(ar)
        # standard-form column contraction (A @ x_col): the only dot_general
        # shape Mosaic lowers efficiently for both f32 and native-narrow
        # operands. Cast-on-load is folded into the MXU for same-dtype
        # narrow (bf16/f16) pairs — the systolic array multiplies them
        # exactly into ar-typed accumulation (zero extra ops, measured
        # 87% of HBM roofline); f32 operands need HIGHEST because the
        # TPU default truncates f32 dot operands to bf16.
        av, xa, prec = _mxu_operands(av_raw, xv, ar)
        if prec == "native":
            prec = None  # raw narrow feed: the MXU upcast is already exact
        # the MXU accumulator is always 32-bit (tpu.matmul constraint); for
        # narrow fixed tiers the block partial is rounded to `ar` before the
        # cross-block accumulate — the tier's rounding at block granularity
        part = jax.lax.dot_general(
            av,
            xa,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # (BM, 1) f32
        if ar_dt != jnp.float32:
            part = part.astype(ar_dt)
        acc_hi[...] = acc_hi[...] + part

    @pl.when(j == n_steps_j - 1)
    def _finish():
        alpha = alpha_ref[0, 0]
        beta = beta_ref[0, 0]
        if ar == "df64":
            total = dfm.df_fold_lanes(dfm.DF(acc_hi[...], acc_lo[...]), 1)  # (BM, 1)
            val = dfm.df_mul_f32(total, alpha)
            # beta == 0 special case: don't read res (it may be uninitialized),
            # mirroring cuda/gemv_kernels.cuh:58-63
            rv = jnp.where(
                beta == 0.0,
                jnp.zeros_like(r_ref[...], jnp.float32),
                r_ref[...].astype(jnp.float32) * beta,
            )
            out = dfm.df_add(val, dfm.df_from(rv))
            ro.store(out)  # cast-on-store: DF -> st_out
        else:
            ar_dt = dtypes.jnp_dtype(ar)
            val = acc_hi[...].astype(jnp.float32) * alpha
            rv = jnp.where(
                beta == 0.0,
                jnp.zeros_like(r_ref[...], jnp.float32),
                r_ref[...].astype(jnp.float32) * beta,
            )
            # tier rounding to `ar` first, then the accessor store-cast
            ro.store((val + rv).astype(ar_dt))


def _chunk_prod(ra: Range, rx: Range, k0: int, precise: bool):
    """Product of the k0-th 128-lane chunk of the row-panel ranges.

    Range raw loads + f32-carrier cast (accessor cast-on-load, the
    ops.dot df64 pattern — exact for every supported storage type).
    precise=True returns the exact two_prod low words as a side channel
    (their f32 accumulation error is O(eps^2) — negligible).
    """
    sl = (slice(None), slice(k0 * 128, (k0 + 1) * 128))
    av = ra.load_raw(sl).astype(jnp.float32)
    xv = rx.load_raw(sl).astype(jnp.float32)
    if precise:
        return dfm.two_prod(av, xv)
    return av * xv, None


def _tail_prod(ra: Range, rx: Range, n: int, precise: bool):
    """Masked product of the ragged tail columns [n//128*128, n).

    Zero-copy arbitrary-size support (the CUDA reference bounds-checks per
    element, ``cuda/dot_benchmark.cu:169``; lanes are physical here): the
    tail rides an OVERLAPPING last-128-lane window [n-128, n) — every load
    stays 128 wide and inside the array, and the columns already covered by
    the full chunks are masked to zero (exact no-ops for both the plain
    product and two_prod). Replaces the round-2 O(m·n) host-side pad copy.
    Requires n >= 128 (smaller operands are VMEM-resident anyway)."""
    rtail = n % 128
    sl = (slice(None), slice(n - 128, n))
    av = ra.load_raw(sl).astype(jnp.float32)
    xv = rx.load_raw(sl).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, av.shape, 1)
    mask = lane >= 128 - rtail
    # mask BOTH operands: the overlap lanes were already accumulated by the
    # full chunks, and 0 * (inf|nan) from a masked-A-only product would
    # poison them (the round-2 pad fallback multiplied by genuinely zero x)
    av = jnp.where(mask, av, 0.0)
    xv = jnp.where(mask, xv, 0.0)
    if precise:
        return dfm.two_prod(av, xv)
    return av * xv, None


def _gemv_fullrow_kernel(
    alpha_ref,
    beta_ref,
    a_ref,
    x_ref,
    r_ref,
    *out_refs,
    n: int,
    st_out: str,
    ar: str = "f32",
    precise: bool = False,
    spec_a: ReducedRowMajor,
    spec_x: ReducedRowMajor,
    spec_out: ReducedRowMajor,
    df_out: bool = False,
):
    # df_out: emit the unrounded DF (hi, lo) pair instead of the storage
    # cast — the cross-chip building block (parallel.pgemv df64 combines
    # per-chip partials exactly; rounding to f32 before the combine would
    # re-lose what the df64 carry preserved)
    o_ref = out_refs[0]
    # one full row panel per grid step (the DOT-like 1-D structure): VPU
    # multiply + pairwise chunk fold; no cross-step carry, no MXU passes.
    # Measured 91% of HBM roofline for f32 at 16384^2 (vs 60% for the
    # HIGHEST-precision MXU form). The body is written against ranges
    # (reference acc_gemv, cuda/gemv_kernels.cuh:79-113): chunk loads go
    # through Range.load_raw + f32-carrier cast, the store through the
    # accessor's cast-on-store.
    ra = Range(spec_a, a_ref, const=True)
    rx = Range(spec_x, x_ref, const=True)
    ro = Range(spec_out, o_ref)
    bm = a_ref.shape[0]
    alpha = alpha_ref[0, 0]
    beta = beta_ref[0, 0]
    rv = jnp.where(
        beta == 0.0,
        jnp.zeros_like(r_ref[...], jnp.float32),
        r_ref[...].astype(jnp.float32) * beta,
    )
    if ar == "df64":
        # two-chain two_sum-compensated (Neumaier) accumulation over 128-lane
        # chunks, products computed chunk-wise straight off the storage panel
        # (the cast-on-load rides the chunk read — bf16/f16 storage streams at
        # its own roofline). Measured v5e 16384^2: f32 372 GFLOP/s (vs
        # fixed-f32 361 — the reference's storage-speed equivalence), bf16
        # 741 (vs fixed-bf16 744; numbers from the Kahan form this replaced).
        # Chain update (mirrors ops.dot's accumulator design):
        #   fast mode: Kahan (4 ops/elem) — error sits at the f32
        #     product-rounding floor, which dominates anyway.
        #   precise mode: branch-free two_sum (7 ops/elem) — Kahan's
        #     fast2sum capture `c=(t-s)-y` is only exact when |s| >= |y|,
        #     and a GEMV row sum over u(-1,1) data wanders through zero:
        #     measured 0.3-6 ulp32 leakage per row at n=1024 (ideal-vs-
        #     kernel flip test, round 4), which put the precise error
        #     endpoint at 4.6e-8 vs the 4.0e-8 exact-arithmetic storage
        #     floor (the reference's published Acc<fp64,fp32> value).
        #     two_sum captures the rounding exactly regardless of magnitude
        #     order — precise is now correctly rounded (0/1024 flips vs the
        #     fp64-over-f32 ideal) and lands ON the floor.
        # Per-row fold trees measured 272 GFLOP/s; whole-panel two_sum
        # halving 322 — the sequential chains win on VPU shape (full
        # (bm, 128) tiles).
        k = n // 128
        chains = min(2, k)
        ss, cs = [], []
        e_acc = None
        for ch in range(chains):
            p0, e0 = _chunk_prod(ra, rx, ch, precise)
            ss.append(p0)
            cs.append(jnp.zeros_like(p0))
            if e0 is not None:
                e_acc = e0 if e_acc is None else e_acc + e0
        for k0 in range(chains, k):
            ch = k0 % chains
            p, e = _chunk_prod(ra, rx, k0, precise)
            if e is not None:
                e_acc = e_acc + e
            if precise:
                t, e2 = dfm.two_sum(ss[ch], p)
                cs[ch] = cs[ch] + e2
            else:
                y = p - cs[ch]
                t = ss[ch] + y
                cs[ch] = (t - ss[ch]) - y
            ss[ch] = t
        if n % 128:
            # ragged tail via the overlapping masked window (zero-copy)
            p, e = _tail_prod(ra, rx, n, precise)
            if not ss:
                # whole row shorter than one lane chunk (tiny shards in
                # parallel.pgemv): the masked tail IS the accumulator seed
                ss, cs = [p], [jnp.zeros_like(p)]
                chains = 1
                if e is not None:
                    e_acc = e
            else:
                if e is not None:
                    e_acc = e_acc + e
                if precise:
                    t, e2 = dfm.two_sum(ss[0], p)
                    cs[0] = cs[0] + e2
                else:
                    y = p - cs[0]
                    t = ss[0] + y
                    cs[0] = (t - ss[0]) - y
                ss[0] = t
        # combine chains exactly; precise's c is the exact captured residual
        # (+c), Kahan's c is the pending deficit (-c) — ops.dot's convention
        sign = 1.0 if precise else -1.0
        tot = dfm.DF(ss[0], sign * cs[0])
        for ch in range(1, chains):
            tot = dfm.df_add(tot, dfm.DF(ss[ch], sign * cs[ch]))
        if e_acc is not None:
            tot = dfm.df_add(tot, dfm.DF(e_acc, jnp.zeros_like(e_acc)))
        total = dfm.df_fold_lanes(tot, 1)  # DF (bm, 1)
        out = dfm.df_add(dfm.df_mul_f32(total, alpha), dfm.df_from(rv))
        if df_out:
            out_refs[0][...] = out.hi
            out_refs[1][...] = out.lo
        else:
            ro.store(out)  # cast-on-store: DF -> st_out
        return
    # chunk-sequential accumulation over 128-lane chunks, reading each chunk
    # straight off the storage panel — measured 376 GF/s at 24576 in the
    # df64 kernel's identical loop structure vs 354 for the whole-panel
    # multiply + tree (the chunk loop overlaps loads with the running sum)
    k = n // 128
    chains = min(FIXED_CHAINS, k)
    ss = []
    for ch in range(chains):
        p0, _ = _chunk_prod(ra, rx, ch, False)
        ss.append(p0)
    for k0 in range(chains, k):
        ch = k0 % chains
        p, _ = _chunk_prod(ra, rx, k0, False)
        ss[ch] = ss[ch] + p
    if n % 128:
        p, _ = _tail_prod(ra, rx, n, False)
        if not ss:
            ss = [p]
            chains = 1
        else:
            ss[0] = ss[0] + p
    s = ss[0]
    for ch in range(1, chains):
        s = s + ss[ch]
    w = 128
    while w > 1:
        w //= 2
        s = s[:, :w] + s[:, w : 2 * w]
    ro.store(s * alpha + rv)


def _gemv_fullrow_call(
    a, x, res, alpha, beta, interpret, st_out: str, ar: str = "f32",
    precise: bool = False, df_out: bool = False,
):
    m, n = a.shape
    itemsize = jnp.dtype(a.dtype).itemsize
    # VMEM budget for the DOUBLED candidate panel (the loop tests 2*bm),
    # against a raised 64 MiB scoped limit (vmem_limit_bytes below; the
    # 16 MiB default capped bm at 32 for n=24576 — bm=128 measured 377.9
    # GF/s there vs 373.7 at bm=32, matching XLA's 377.6).
    # 8-bit storage tiles at (32, 128) — its row panel floor is 32
    bm = 32 if itemsize == 1 else 8
    if ar != "df64":
        while (2 * (2 * bm) * n * itemsize + n * 4 <= 7 * 2**23
               and 2 * bm <= max(m, 8)):
            bm *= 2
        # row-panel cap targets ~8 MiB per grid step: beyond that the DMA
        # granularity wins nothing (measured at f32 24576, bm 128 vs 256
        # equal), but BELOW ~1 MiB the fixed per-step cost dominates — the
        # dense-grid sweep measured bf16 at 0.68x XLA at n=3200 (461 vs 677
        # GF/s) with the old hard bm=128 cap, ramping to only 0.93x at 23680
        bm_cap = 128
        while bm_cap < 1024 and bm_cap * n * itemsize < 8 * 2**20:
            bm_cap *= 2
        bm = min(bm, bm_cap)
    else:
        # the Kahan accumulators/chunk temporaries are (bm, 128)-small, so
        # the double-buffered input panel is the whole budget; measured
        # throughput rises with bm up to 128 (256 exhausts VMEM at n=16384)
        # same per-step-volume floor as the plain path, but conservative
        # (256 max): the Kahan accumulators scale with bm, and 256 exhausted
        # the scoped VMEM at n=16384 under the old budget — allow it only
        # where a 128-row panel is under 2 MiB (small/mid n, where the
        # per-step overhead showed as the dense-grid df64-bf16 dip at 3200)
        df_cap = 256 if 128 * n * itemsize < 2 * 2**20 else 128
        while (
            2 * (2 * bm) * n * itemsize <= 8 * 2**20
            and 2 * bm <= max(m, 8)
            and 2 * bm <= df_cap
        ):
            bm *= 2
    grid = (pl.cdiv(m, bm),)
    o_spec = pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    if df_out:
        out_specs = (o_spec, o_spec)
        out_shape = (
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        )
    else:
        out_specs = o_spec
        out_shape = jax.ShapeDtypeStruct((m, 1), dtypes.jnp_dtype(st_out))
    out = pl.pallas_call(
        functools.partial(
            _gemv_fullrow_kernel, n=n, st_out=st_out, ar=ar, precise=precise,
            spec_a=ReducedRowMajor(ar, dtypes.canon(a.dtype)),
            spec_x=ReducedRowMajor(ar, dtypes.canon(x.dtype)),
            spec_out=ReducedRowMajor(ar, st_out),
            df_out=df_out,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=compiler_params(
            dimension_semantics=("arbitrary",),
            # raise the 16 MiB default scope: v5e VMEM is 128 MiB and the
            # big row panels (bm=128 at n=24576 = 2x12.6 MiB) measure best
            vmem_limit_bytes=64 * 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n, bytes_accessed=m * n * itemsize, transcendentals=0
        ),
        interpret=interpret,
    )(
        jnp.full((1, 1), alpha, jnp.float32),
        jnp.full((1, 1), beta, jnp.float32),
        a,
        x.reshape(1, n),
        res.reshape(m, 1),
    )
    if df_out:
        return dfm.DF(out[0].reshape(m), out[1].reshape(m))
    return out.reshape(m)


def _gemv_df_chunked(a, x, res, alpha, beta, precise: bool, interpret,
                     chunk: int):
    """Column-chunked df_out GEMV: per-chunk unrounded DF fullrow partials
    (alpha=1, beta=0) combined with exact df_add, alpha/beta applied once in
    DF — identical semantics to the single fullrow call, for operands past
    its VMEM panel budget."""
    m, n = a.shape
    starts = list(range(0, n, chunk))
    if len(starts) > 1 and n - starts[-1] < 128:
        starts.pop()  # fold a sub-128 remainder into the previous chunk
    zero = jnp.zeros((m,), jnp.float32)
    tot = None
    for i, c0 in enumerate(starts):
        c1 = starts[i + 1] if i + 1 < len(starts) else n
        part = _gemv_fullrow_call(
            a[:, c0:c1], x[c0:c1], zero, 1.0, 0.0,
            interpret, "f32", ar="df64", precise=precise, df_out=True,
        )
        tot = part if tot is None else dfm.df_add(tot, part)
    beta32 = jnp.asarray(beta, jnp.float32)  # asarray: beta may be traced
    rv = jnp.where(
        beta32 == 0.0,
        jnp.zeros((m,), jnp.float32),
        res.astype(jnp.float32) * beta32,
    )
    return dfm.df_add(
        dfm.df_mul_f32(tot, jnp.asarray(alpha, jnp.float32)), dfm.df_from(rv)
    )


def _gemv_call(a, x, res, alpha, beta, ar: str, precise: bool, interpret,
               resident=None, df_out=False):
    if df_out and ar != "df64":
        raise ValueError("df_out requires ar='df64'")
    m, n = a.shape
    if x.shape != (n,) or res.shape != (m,):
        raise ValueError(f"shape mismatch: A{a.shape} x{x.shape} res{res.shape}")
    if interpret is None:
        interpret = interpret_default()
    st_out = dtypes.canon(res.dtype)

    if ar == "df64" and not interpret:
        # Mosaic has no f16 type, and forcing the resident composition at
        # sweep scales materializes multi-GiB f32 temporaries — upcast f16
        # EXACTLY to f32 once and stream the f32 df64 fullrow kernel
        if a.dtype == jnp.float16:
            a = a.astype(jnp.float32)
        if x.dtype == jnp.float16:
            x = x.astype(jnp.float32)

    auto_resident = resident is None
    if auto_resident:
        resident = (
            m * n * jnp.dtype(a.dtype).itemsize <= RESIDENT_BYTES
            and jax.default_backend() == "tpu"
        )
    # Mosaic has no f16 type (v5e rejects it at kernel compile), and its
    # 8-bit vreg paths run far below XLA's own f8 lowering (see ops.dot /
    # BENCH_NOTES) — narrow-storage tiers run XLA-composed at every size on
    # hardware (same-dtype f8 pairs feed the MXU raw). Pallas forms still
    # serve CPU interpret mode; df64-over-f8 keeps the streaming kernel.
    narrow_st = (jnp.float16,) + _F8
    if not interpret and (a.dtype in narrow_st or x.dtype in narrow_st):
        if ar != "df64" or jnp.float16 in (a.dtype, x.dtype):
            if not auto_resident and not resident:
                raise NotImplementedError(
                    "gemv: the streaming Pallas kernel cannot serve "
                    f"{a.dtype}/{x.dtype} storage on TPU hardware (Mosaic has "
                    "no f16 type and its 8-bit paths run far below XLA's own "
                    "lowering); drop resident=False or use interpret=True"
                )
            resident = True
    if resident:
        return _gemv_small(a, x, res, alpha, beta, ar, precise, st_out,
                           df_out=df_out)

    # full-row VPU path: f32 arithmetic over f32 storage (fastest exact
    # form), and df64 arithmetic over ANY storage (the Kahan chains ride the
    # storage roofline — bf16 storage measured 741 GFLOP/s vs the MXU grid's
    # 108). f32-over-narrow keeps the native-MXU 2-D grid (733 GFLOP/s).
    fullrow_ok = (ar == "f32" and a.dtype == jnp.float32) or (
        ar == "df64"
        and a.dtype in (jnp.float32, jnp.bfloat16, jnp.float16) + _F8
    )
    # 8-bit storage tiles at (32, 128): tiny-m matrices can't form a legal
    # row panel — route them through the resident mode (they're VMEM-scale
    # anyway)
    if a.dtype in _F8 and m < 32:
        return _gemv_small(a, x, res, alpha, beta, ar, precise, st_out,
                           df_out=df_out)
    itemsize = jnp.dtype(a.dtype).itemsize
    # ragged n rides the fullrow kernel's overlapping masked tail window
    # (zero-copy, see _tail_prod — replaces round 2's O(m·n) pad copy).
    # 8-bit storage keeps the pad fallback: the tail's unaligned slice sits
    # outside Mosaic's (32, 128) 8-bit tile support — gate on the NARROWER
    # of a/x (an 8-bit x under a wider A takes the same unaligned slice)
    min_item = min(itemsize, jnp.dtype(x.dtype).itemsize)
    # Sub-32-bit storage keeps the pad fallback on hardware: the tail's
    # unaligned last-128-lane slice sits outside Mosaic's (32, 128) 8-bit
    # tile support, and unaligned 16-bit relayouts have crashed Mosaic
    # elsewhere (the DOT 1-D bf16 view) — only itemsize-4 storage rides the
    # zero-copy masked tail on TPU (CPU interpret still exercises all dtypes)
    if ar == "df64" and min_item < 4 and n % 128 != 0 and not interpret:
        pad = 128 - n % 128
        a = jnp.pad(a, ((0, 0), (0, pad)))
        x = jnp.pad(x, (0, pad))
        n = n + pad

    # the row panel must fit VMEM double-buffered even at the minimum bm
    # (8 rows; 32 for 8-bit storage whose native tile is (32, 128))
    min_bm = 32 if itemsize == 1 else 8
    ragged_ok = n % 128 == 0 or (n >= 128 and (min_item == 4 or interpret))
    if fullrow_ok and ragged_ok and 2 * min_bm * n * itemsize <= 8 * 2**20:
        return _gemv_fullrow_call(
            a, x, res, alpha, beta, interpret, st_out, ar=ar, precise=precise,
            df_out=df_out,
        )
    if df_out:
        # Sub-chunk rows (n < 128, e.g. tiny shards under parallel.pgemv)
        # can't ride the fullrow kernel's overlapping tail window
        # (_tail_prod needs n >= 128) — they're VMEM-scale, use the exact
        # resident composition which also emits DF.
        if n < 128:
            return _gemv_small(a, x, res, alpha, beta, ar, precise, st_out,
                               df_out=True)
        # Column-chunked exact fallback: one fullrow panel is budget-capped
        # at 2*min_bm*n*itemsize <= 8 MiB (~131072 f32 columns) — beyond it,
        # split the columns at the widest in-budget 128-multiple, emit each
        # chunk's UNROUNDED DF partial (alpha=1, beta=0), and df_add exactly.
        # Same combine discipline as parallel.pgemv, so the multi-chip df64
        # tier has no per-shard width cap (the chunk slices cost one extra
        # O(m*n) copy — a functional fallback, not the fast path).
        if not fullrow_ok:
            raise NotImplementedError(
                "df_out requires a df64-capable storage dtype "
                f"(got A {a.dtype}, x {x.dtype})"
            )
        chunk = max(128, (8 * 2**20 // (2 * min_bm * itemsize)) // 128 * 128)
        return _gemv_df_chunked(a, x, res, alpha, beta, precise, interpret,
                                chunk)

    # df64's compensated-fold temporaries live in VMEM: keep its row-block
    # at 512 (1024 OOMs the 16 MiB scoped budget with bf16 storage)
    bm_cap = 512 if ar == "df64" else BM_MAX
    bm = min(bm_cap, pow2_ceil(max(m, min_bm)))
    bn = min(BN_MAX, pow2_ceil(max(n, 128)))
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn))

    # df64 (VPU broadcast) wants x as a (1, n) row; MXU paths want the
    # (n, 1) column for the standard contraction
    x2 = x.reshape(1, n) if ar == "df64" else x.reshape(n, 1)
    r2 = res.reshape(m, 1)
    alpha2 = jnp.full((1, 1), alpha, jnp.float32)
    beta2 = jnp.full((1, 1), beta, jnp.float32)

    acc_dt = jnp.float32 if ar == "df64" else dtypes.jnp_dtype(ar)
    acc_shape = (bm, 128) if ar == "df64" else (bm, 1)
    kernel = functools.partial(
        _gemv_kernel,
        ar=ar,
        st_out=st_out,
        n_total=n,
        bn=bn,
        n_steps_j=grid[1],
        precise=precise,
        spec_a=ReducedRowMajor(ar, dtypes.canon(a.dtype)),
        spec_x=ReducedRowMajor(ar, dtypes.canon(x.dtype)),
        spec_out=ReducedRowMajor(ar, st_out),
    )
    if ar == "df64":
        scratch = [pltpu.VMEM(acc_shape, acc_dt), pltpu.VMEM(acc_shape, acc_dt)]
        kernel2 = kernel
    else:
        scratch = [pltpu.VMEM(acc_shape, acc_dt)]
        kernel2 = functools.partial(kernel, acc_lo=None)

    out = pl.pallas_call(
        kernel2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            (
                pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM)
                if ar == "df64"
                else pl.BlockSpec((bn, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM)
            ),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, 1), dtypes.jnp_dtype(st_out)),
        scratch_shapes=scratch,
        compiler_params=compiler_params(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n,
            bytes_accessed=m * n * dtypes.storage_bytes(dtypes.canon(a.dtype)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(alpha2, beta2, a, x2, r2)
    return out.reshape(m)


def gemv(a, x, res, alpha=1.0, beta=1.0, *, interpret=None, resident=None):
    """Fixed-precision GEMV: arithmetic == storage dtype (reference ``gemv``
    launcher, ``cuda/gemv_kernels.cuh:136-147``). `resident` selects the
    XLA-composed small-matrix mode (default: auto by size on TPU)."""
    if x.dtype != a.dtype:
        raise ValueError(
            f"fixed-tier gemv needs matching storage dtypes, got A {a.dtype} "
            f"x {x.dtype} (a wider x would be silently truncated to A's "
            "dtype — use acc_gemv for mixed storage)"
        )
    ar = dtypes.check_arithmetic(a.dtype)  # f8 storage has no fixed tier
    return _gemv_call(a, x, res, alpha, beta, ar, precise=False,
                      interpret=interpret, resident=resident)


def acc_gemv(a, x, res, alpha=1.0, beta=1.0, ar="df64", *, precise=False,
             interpret=None, resident=None, df_out=False):
    """Accessor mixed-precision GEMV (reference ``acc_gemv``,
    ``cuda/gemv_kernels.cuh:168-193``): storage dtypes from the arrays,
    arithmetic per `ar` ('f32' | 'df64' | 'bf16').

    `df_out=True` (df64 only) returns the UNROUNDED result as a `DF` pair
    instead of casting to the output storage — the building block for exact
    cross-chip combines (`parallel.pgemv` with ar='df64') and user-level
    compensated compositions."""
    ar = dtypes.check_arithmetic(ar)
    return _gemv_call(a, x, res, alpha, beta, ar, precise=precise,
                      interpret=interpret, resident=resident, df_out=df_out)


def xla_gemv(a, x, res, alpha=1.0, beta=1.0):
    """Vendor-baseline tier (the cublas_gemv analogue,
    ``cuda/gemv_kernels.cuh:198-243``).

    f32 operands run at HIGHEST precision (TPU default truncates f32 matmul
    operands to bf16 — the reference's cuBLAS fp32 was genuine f32); narrow
    operands are natively exact on the MXU. beta == 0 does not read res
    (cublasSgemv semantics, ``cuda/gemv_kernels.cuh:58-63`` — an
    uninitialized res must not poison the output).
    """
    prec = (jax.lax.Precision.HIGHEST
            if jnp.float32 in (a.dtype, x.dtype) else None)
    rv = jnp.where(beta == 0.0, jnp.zeros_like(res, jnp.float32),
                   beta * res.astype(jnp.float32))
    return (alpha * jnp.matmul(a, x, precision=prec) + rv).astype(res.dtype)
