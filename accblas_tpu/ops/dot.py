"""DOT kernels: fixed-precision, accessor mixed-precision, and XLA baseline.

TPU-native rebuild of the reference's DOT family (``cuda/dot_kernels.cuh``):

- ``kernel::dot`` (grid-stride loop + shared-mem block reduce + one global
  atomic per block, ``cuda/dot_kernels.cuh:87-116``) becomes a Pallas kernel
  with a 1-D sequential grid over (R, 128) tiles: per-lane partials live in a
  VMEM scratch accumulator carried across grid steps — TPU grid order replaces
  the atomics — and the final step folds the accumulator to a scalar (the
  block-reduce analogue).
- ``kernel::acc_dot`` (``cuda/dot_kernels.cuh:131-161``) is the same body
  written against accessor ranges: storage dtype decoupled from arithmetic
  dtype via cast-on-load. df64 arithmetic uses interleaved Kahan compensated
  chains (4 VPU ops/elem) so the kernel stays HBM-bandwidth-bound even in
  precise (exact two_prod) mode.
- ``cublas_dot`` (``cuda/dot_kernels.cuh:268-299``) maps to `xla_dot`
  (XLA's own reduction — the vendor tier).
- The ``init_res`` zeroing kernel and the 16-byte device scratch of
  ``myBlasHandle`` (``cuda/dot_kernels.cuh:29-65,78-82``) are unnecessary:
  the accumulator is VMEM scratch zeroed at grid step 0, and results are
  functional outputs.

Result-type conversion (``kernel::cast_result``, ``cuda/dot_kernels.cuh:168``)
happens host-side on the returned scalar.
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
from .common import as_rows128, compiler_params, interpret_default, min_sublanes, pow2_ceil

# (rows, 128) per grid step; df64 keeps smaller blocks (compensated-fold
# temporaries live in VMEM), plain tiers use larger ones (measured +2% at 2048)
MAX_BLOCK_ROWS = 2048
MAX_BLOCK_ROWS_DF64 = 2048  # fast mode: 2048 measured best (188.8 GF/s)
# precise mode wants 4096-row blocks under the raised 64 MiB VMEM scope:
# 173 -> 187.8 GF/s at n=2^27 (92% roofline — equal to fast mode; the
# exact-two_prod tier at fixed-f32 speed), rel err unchanged at 7.4e-13
MAX_BLOCK_ROWS_DF64_PRECISE = 4096
DF_ROWS_ACC = 32  # Kahan chunk rows per chain
DF_CHAINS = 2  # interleaved chains (fast mode; measured best error at 2)
DF_CHAINS_PRECISE = 4  # shorter exact-two_sum chains: 7.4e-13 vs 2.7e-12 at 2

# below this many input bytes the operands fit VMEM and XLA keeps them
# resident across repeated calls (e.g. a solver's iteration loop) — a Pallas
# kernel re-streams HBM every call and measured 161-181 GFLOP/s against
# XLA's 851-1390 at n <= 2^22. The small-n mode expresses the SAME tier
# algorithm in jnp ops so the compiler owns placement (the TPU analogue of
# the reference's L2-resident small sizes).
RESIDENT_BYTES = 32 * 2**20


def _dot_small(x, y, ar: str, precise: bool, init):
    """XLA-composed small-n DOT with identical tier semantics.

    fast df64: f32 products + exact two_sum halving tree (compensated, flat
    error); precise df64: exact two_prod products too. Fixed tiers: products
    and pairwise accumulation in the arithmetic dtype.
    """
    if ar == "df64":
        init_f = (jnp.float32(0.0) if init is None
                  else jnp.asarray(init, jnp.float32))  # traced init ok
        if jnp.float64 in (x.dtype, y.dtype):
            # exact two-word split per the accessor contract
            # (range.load_cast: truncating f64 storage to one f32 would
            # silently drop ~29 bits) — CPU/x64 only; products and the fold
            # run full df64, oracle-style (ops/oracle.py)
            def _split(v):
                hi = v.astype(jnp.float32)
                lo = (v - hi.astype(v.dtype)).astype(jnp.float32)
                return dfm.DF(hi, lo)

            tot = dfm.df_sum(dfm.df_mul(_split(x), _split(y)))
            tot = dfm.df_add(tot, dfm.df_from(init_f))
            return tot.hi, tot.lo
        xa = x.astype(jnp.float32)
        ya = y.astype(jnp.float32)
        if precise:
            p, e = dfm.two_prod(xa, ya)
        else:
            p, e = xa * ya, None
        p2 = as_rows128(p)
        e2 = as_rows128(e) if e is not None else None
        d = dfm.cascaded_fold(p2, out_rows=8, err=e2)
        tot = dfm.df_fold_lanes(dfm.df_fold_rows(d, 1), 1)
        tot = dfm.df_add(tot, dfm.df_from(init_f))
        return tot.hi[0, 0], tot.lo[0, 0]
    ar_dt = dtypes.jnp_dtype(ar)
    if ar == "f32":
        # XLA's native dot: f32 (or wider-exact MXU) accumulation of exact
        # products — the tier's semantics, at XLA's own lowering speed.
        # Measured 740 GF/s for f8 operands at n=2^26 (90% of the f8 storage
        # roofline) where every Mosaic path topped out at 74-122 GF/s (8-bit
        # vreg unpacking); HIGHEST guards genuine-f32 operands against the
        # TPU default's bf16 truncation, narrow operands are natively exact.
        if x.dtype != y.dtype:
            # mixed-storage pairs: explicit f32 upcast (jax forbids implicit
            # float8 promotion), HIGHEST to keep the f32 side genuine
            x, y = x.astype(jnp.float32), y.astype(jnp.float32)
        prec = (
            jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
        )
        total = jnp.dot(x, y, precision=prec, preferred_element_type=jnp.float32)
        if init is not None:
            total = total + init
        return total.astype(jnp.float32), jnp.float32(0.0)
    p = (x.astype(ar_dt) * y.astype(ar_dt)).astype(ar_dt)
    p2 = as_rows128(p)
    # pairwise halving tree in the arithmetic dtype (the tier's defining
    # rounding), matching the Pallas kernel's accumulation structure
    while p2.shape[0] > 1:
        half = p2.shape[0] // 2
        top = p2[:half] + p2[half : 2 * half]
        if p2.shape[0] % 2:
            top = jnp.concatenate([top[:1] + p2[2 * half :], top[1:]], 0)
        p2 = top
    w = p2.shape[1]
    while w > 1:
        w //= 2
        p2 = p2[:, :w] + p2[:, w : 2 * w]
    total = p2[0, 0]
    if init is not None:
        total = (total.astype(jnp.float32) + init).astype(ar_dt)
    return total.astype(jnp.float32), jnp.float32(0.0)


def _dot_kernel(
    init_ref,
    x_ref,
    y_ref,
    hi_ref,
    lo_ref,
    acc_hi,
    acc_lo,
    *,
    spec_x: ReducedRowMajor,
    spec_y: ReducedRowMajor,
    ar: str,
    rows_total: int,
    block_rows: int,
    n_steps: int,
    precise: bool,
    rows_acc: int = 8,
    chains: int = 1,
    n_elems: int | None = None,
):
    i = pl.program_id(0)
    # two masking granularities: row-level for the aligned (rows, 128)
    # layout, element-level for the zero-copy ragged 1-D layout (n % 128
    # != 0 — the kernel streams the original buffer and masks the true
    # element tail; a (rows, 128) reshape would need a pad copy)
    ragged = rows_total % block_rows != 0 or n_elems is not None

    def _mask(p, fill):
        if not ragged:
            return p
        rowid = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
        if n_elems is not None:
            colid = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
            gid = rowid * 128 + colid
            return jnp.where(gid < n_elems - i * block_rows * 128, p, fill)
        return jnp.where(rowid < rows_total - i * block_rows, p, fill)

    @pl.when(i == 0)
    def _init():
        # seed the accumulator with the runtime init scalar at [0, 0]
        # ("accumulate into" semantics; also the chain point for loop-timed
        # benchmarking). One-hot write keeps sub-32-bit dtypes array-level.
        rid = jax.lax.broadcasted_iota(jnp.int32, acc_hi.shape, 0)
        cid = jax.lax.broadcasted_iota(jnp.int32, acc_hi.shape, 1)
        seed = jnp.where(
            (rid == 0) & (cid == 0), init_ref[0, 0], jnp.float32(0.0)
        ).astype(acc_hi.dtype)
        acc_hi[...] = seed
        acc_lo[...] = jnp.zeros_like(acc_lo)

    rx = Range(spec_x, x_ref, const=True)
    ry = Range(spec_y, y_ref, const=True)

    if ar == "df64":
        # accessor cast-on-load to f32 carriers of the df64 values
        xa = rx.load_raw().astype(jnp.float32)
        ya = ry.load_raw().astype(jnp.float32)
        if xa.ndim == 1:  # 1-D ragged layout -> native (rows, 128) view
            xa = xa.reshape(-1, 128)
            ya = ya.reshape(-1, 128)
        if precise:
            p, e = dfm.two_prod(xa, ya)
        else:
            p, e = xa * ya, None
        # interleaved compensated chains at (rows_acc, 128) granularity:
        # acc_hi holds the running sums s of all chains stacked, acc_lo the
        # compensation channel c. Full-tile shapes at high VPU occupancy
        # replace the reference's per-thread fp64 partials + shared-memory
        # reduce (cuda/kernel_utils.cuh:69-89).
        #
        # fast mode: Kahan (4 VPU ops/elem, c = pending deficit) — error
        #   stays at the f32 product-rounding floor, flat in n (the tier's
        #   defining error; matches the reference's Acc<fp64,fp32> plots).
        # precise mode: exact two_sum chains (c = exact running error, plus
        #   the two_prod low words) — arithmetic error ~2^-48, first-order
        #   losses zero (Kahan's per-step capture is only first-order, which
        #   would bury the exact product corrections).
        def _accum_df(p, e):
            s_all = acc_hi[...]
            c_all = acc_lo[...]
            ss = [s_all[ch * rows_acc : (ch + 1) * rows_acc] for ch in range(chains)]
            cs = [c_all[ch * rows_acc : (ch + 1) * rows_acc] for ch in range(chains)]
            for k0 in range(block_rows // rows_acc):
                ch = k0 % chains
                pk = p[k0 * rows_acc : (k0 + 1) * rows_acc]
                if precise:
                    s_new, e_new = dfm.two_sum(ss[ch], pk)
                    cs[ch] = cs[ch] + (e_new + e[k0 * rows_acc : (k0 + 1) * rows_acc])
                    ss[ch] = s_new
                else:
                    y = pk - cs[ch]
                    t = ss[ch] + y
                    cs[ch] = (t - ss[ch]) - y
                    ss[ch] = t
            acc_hi[...] = jnp.concatenate(ss, 0)
            acc_lo[...] = jnp.concatenate(cs, 0)

        if ragged:
            # the garbage rows/elements live only in the FINAL block — the
            # iota mask runs there alone. Masking inline on every step cost
            # the VPU-bound bf16 tiers ~6% across the whole dense grid
            # (355 vs 377 GF/s, round-5 dense capture).
            @pl.when(i < n_steps - 1)
            def _full():
                _accum_df(p, e)

            @pl.when(i == n_steps - 1)
            def _tail():
                _accum_df(_mask(p, 0.0), None if e is None else _mask(e, 0.0))
        else:
            _accum_df(p, e)
    else:
        ar_dt = dtypes.jnp_dtype(ar)
        xa = rx.load()
        ya = ry.load()
        if xa.ndim == 1:  # 1-D ragged layout -> native (rows, 128) view
            xa = xa.reshape(-1, 128)
            ya = ya.reshape(-1, 128)
        p = (xa * ya).astype(ar_dt)

        def _accum_tree(p):
            sub = acc_hi.shape[0]
            # pairwise tree of elementwise adds in the arithmetic dtype
            # (Mosaic has no sub-32-bit reduce ops; block_rows and sub are
            # powers of two)
            pr = p.reshape(block_rows // sub, sub, 128)
            while pr.shape[0] > 1:
                half = pr.shape[0] // 2
                pr = pr[:half] + pr[half:]
            acc_hi[...] = acc_hi[...] + pr[0]

        if ragged:
            # final-block-only masking; see the df64 branch note
            @pl.when(i < n_steps - 1)
            def _full():
                _accum_tree(p)

            @pl.when(i == n_steps - 1)
            def _tail():
                _accum_tree(_mask(p, jnp.zeros((), ar_dt)))
        else:
            _accum_tree(p)

    @pl.when(i == n_steps - 1)
    def _finish():
        if ar == "df64":
            s_all = acc_hi[...]
            c_all = acc_lo[...]
            # per chain: precise's c is the exact accumulated error (+c);
            # Kahan's c is the pending deficit (-c). Combine chains exactly.
            sign = 1.0 if precise else -1.0
            tot = dfm.DF(s_all[:rows_acc], sign * c_all[:rows_acc])
            for ch in range(1, chains):
                tot = dfm.df_add(
                    tot,
                    dfm.DF(
                        s_all[ch * rows_acc : (ch + 1) * rows_acc],
                        sign * c_all[ch * rows_acc : (ch + 1) * rows_acc],
                    ),
                )
            t = dfm.df_fold_lanes(dfm.df_fold_rows(tot, 1), 1)
            hi_ref[0, 0] = t.hi[0, 0]
            lo_ref[0, 0] = t.lo[0, 0]
        else:
            # Mosaic has no sub-32-bit reductions/scalars: fold the (sub, 128)
            # partial tile in f32 (the tier's defining error is the per-element
            # accumulate, which stayed in `ar`), round to `ar` in-array, read
            # back as f32
            total = jnp.sum(acc_hi[...].astype(jnp.float32), keepdims=True)
            total = total.astype(dtypes.jnp_dtype(ar)).astype(jnp.float32)
            hi_ref[0, 0] = total[0, 0]
            lo_ref[0, 0] = jnp.float32(0.0)


def _dot_call(x, y, ar: str, precise: bool, interpret, init=None, resident=None):
    if x.shape != y.shape or x.ndim != 1:
        raise ValueError(f"dot expects equal-length vectors, got {x.shape} {y.shape}")
    if interpret is None:
        interpret = interpret_default()
    if ar == "df64" and jnp.float64 in (x.dtype, y.dtype):
        # f64 storage (CPU/x64 only): the exact-split composition at every
        # size — the streaming kernel's f32-carrier load would truncate
        return _dot_small(x, y, ar, precise, init)
    if ar == "df64" and not interpret:
        # Mosaic has no f16 type, and the resident composition materializes
        # ~4x f32 temporaries (unsafe at sweep scales) — upcast f16 EXACTLY
        # to f32 once and stream the f32 df64 Pallas kernel instead
        if x.dtype == jnp.float16:
            x = x.astype(jnp.float32)
        if y.dtype == jnp.float16:
            y = y.astype(jnp.float32)
    in_bytes = x.shape[0] * (x.dtype.itemsize + y.dtype.itemsize)
    auto_resident = resident is None
    if auto_resident:
        resident = in_bytes <= RESIDENT_BYTES and jax.default_backend() == "tpu"
    # Mosaic has no f16 type (v5e rejects it at kernel compile), and its
    # 8-bit vreg paths run at ~9-15% of roofline where XLA's own f8 lowering
    # hits 90% (measured; see BENCH_NOTES) — both narrow-storage tiers run
    # XLA-composed at every size on hardware. The Pallas forms still serve
    # CPU interpret mode (tests). df64-over-f8 keeps the streaming Pallas
    # kernel (the resident df64 composition materializes ~4x f32
    # temporaries — unsafe at sweep scales).
    narrow_st = (jnp.float16, jnp.float8_e4m3fn, jnp.float8_e5m2)
    if not interpret and (x.dtype in narrow_st or y.dtype in narrow_st):
        if ar != "df64" or jnp.float16 in (x.dtype, y.dtype):
            if not auto_resident and not resident:
                raise NotImplementedError(
                    "dot: the streaming Pallas kernel cannot serve "
                    f"{x.dtype}/{y.dtype} storage on TPU hardware (Mosaic has "
                    "no f16 type and its 8-bit paths run far below XLA's own "
                    "lowering); drop resident=False or use interpret=True"
                )
            resident = True
    # zero-copy ragged for the bf16 acc32 tier: the in-kernel (L,)->(rows,128)
    # view is f32-only (the 16-bit relayout crashes Mosaic's compile helper),
    # so the streaming kernel needs an O(n) pad copy (~3x bytes) at any n not
    # aligned to the (16, 128) bf16 tile. XLA's native bf16 dot (exact f32
    # MXU accumulate — the same lowering the f8 tier rides to 91% of ITS
    # roofline at n=2^29) streams the unpadded buffers instead.
    # Hardware-validated on v5e (probe_r4c at n=123456791): this route
    # 373.7 GF/s vs the pad fallback's 114.5, matching aligned 2^27 375.2.
    if (
        not interpret
        and auto_resident
        and not resident
        and ar == "f32"
        and jnp.bfloat16 in (x.dtype, y.dtype)
        and x.shape[0] % (128 * 16) != 0
        and jax.default_backend() == "tpu"
    ):
        resident = True
    if resident:
        return _dot_small(x, y, ar, precise, init)
    spec_x = ReducedRowMajor(ar, dtypes.canon(x.dtype))
    spec_y = ReducedRowMajor(ar, dtypes.canon(y.dtype))

    # mixed-storage inputs must agree on row geometry: pad both to the wider
    # of the two native sublane tiles (8-bit storage tiles at (32, 128)).
    # Ragged n keeps the ORIGINAL 1-D buffers (a (rows, 128) reshape would
    # be a pad copy — the round-2 3x ragged penalty); the kernel views each
    # 1-D block as (rows, 128) in-register (native layout, probed at full
    # aligned speed) and masks the element tail.
    st_rows = max(min_sublanes(x.dtype), min_sublanes(y.dtype))
    n_elems = x.shape[0]
    # the zero-copy 1-D view is f32-only: sub-32-bit storage packs multiple
    # sublanes per vreg row, so the in-kernel (L,) -> (L/128, 128) view is a
    # relayout Mosaic cannot lower (compile-helper crash at bf16 ragged) —
    # those tiers keep the pad fallback
    lanes1d = n_elems % 128 != 0 and x.dtype.itemsize == 4 and y.dtype.itemsize == 4
    if lanes1d:
        x2, y2 = x, y
        rows = pl.cdiv(n_elems, 128)
    else:
        x2 = as_rows128(x, min_rows=st_rows)
        y2 = as_rows128(y, min_rows=st_rows)
        rows = x2.shape[0]
    if ar == "df64":
        cap = MAX_BLOCK_ROWS_DF64_PRECISE if precise else MAX_BLOCK_ROWS_DF64
    else:
        cap = MAX_BLOCK_ROWS
    # bf16 accumulators want the (16, 128) native tile; block_rows must not
    # drop below the accumulator sublane count (small-n bf16 inputs give
    # rows=8 < sub=16 — ragged masking handles rows < block_rows), nor below
    # the storage tile (8-bit inputs need 32-row blocks)
    sub = 16 if ar == "bf16" else 8
    block_rows = min(cap, pow2_ceil(max(rows, sub, st_rows)))
    n_steps = pl.cdiv(rows, block_rows)

    # df64 Kahan accumulator geometry: (rows_acc, 128) chunks over `chains`
    # interleaved chains (32-row chunks = 4 vregs per op keep the VPU
    # pipeline fed; 2 chains hide the serial dependency)
    rows_acc = min(DF_ROWS_ACC, block_rows)
    chains = DF_CHAINS_PRECISE if precise else DF_CHAINS
    while chains > 1 and block_rows < chains * rows_acc:
        chains //= 2
    if ar == "df64":
        sub = rows_acc * chains
    acc_dt = jnp.float32 if ar == "df64" else dtypes.jnp_dtype(ar)

    kernel = functools.partial(
        _dot_kernel,
        spec_x=spec_x,
        spec_y=spec_y,
        ar=ar,
        rows_total=rows,
        block_rows=block_rows,
        n_steps=n_steps,
        precise=precise,
        rows_acc=rows_acc,
        chains=chains,
        n_elems=n_elems if lanes1d else None,
    )
    init2 = jnp.full((1, 1), 0.0 if init is None else init, jnp.float32)
    if lanes1d:
        vec_spec = pl.BlockSpec(
            (block_rows * 128,), lambda i: (i,), memory_space=pltpu.VMEM
        )
    else:
        vec_spec = pl.BlockSpec(
            (block_rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
    hi, lo = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            vec_spec,
            vec_spec,
        ],
        out_specs=(
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((sub, 128), acc_dt),
            pltpu.VMEM((sub, 128), acc_dt),
        ],
        compiler_params=compiler_params(
            dimension_semantics=("arbitrary",),
            # v5e VMEM is 128 MiB; the 16 MiB scoped default rejects the
            # 4096-row precise blocks (20 MiB incl. double buffering)
            vmem_limit_bytes=64 * 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * x.shape[0],
            bytes_accessed=x.shape[0]
            * (dtypes.storage_bytes(spec_x.st) + dtypes.storage_bytes(spec_y.st)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(init2, x2, y2)
    return hi[0, 0], lo[0, 0]


def dot(x, y, *, init=None, interpret=None, resident=None):
    """Fixed-precision DOT: arithmetic type == storage type.

    The hand-written variant tier (reference ``dot`` launcher,
    ``cuda/dot_kernels.cuh:192-206``). Returns a scalar in the storage dtype.
    `init` seeds the accumulator (default 0). `resident` selects the
    XLA-composed small-n mode (default: auto by size on TPU).
    """
    if y.dtype != x.dtype:
        raise ValueError(
            f"fixed-tier dot needs matching storage dtypes, got x {x.dtype} "
            f"y {y.dtype} (a wider y would be silently truncated — use "
            "acc_dot for mixed storage)"
        )
    ar = dtypes.check_arithmetic(x.dtype)  # f8 storage has no fixed tier
    hi, _ = _dot_call(x, y, ar, precise=False, interpret=interpret, init=init,
                      resident=resident)
    return hi.astype(dtypes.jnp_dtype(ar))


def acc_dot(
    x, y, ar="df64", *, precise: bool = False, res_dtype=None, init=None,
    interpret=None, resident=None
):
    """Accessor mixed-precision DOT (reference ``acc_dot``,
    ``cuda/dot_kernels.cuh:224-263``).

    Storage dtypes come from the arrays; `ar` is the arithmetic type
    ('f32' | 'df64' | 'bf16'). With ar='df64', `precise=True` computes exact
    two_prod products (accumulator error ~2^-48); the default keeps products
    in f32 (error stays at the fp32 storage floor — the property the
    reference's plots demonstrate) at lower VPU cost.

    Returns a DF scalar for ar='df64' (use .hi or ops.df64.df_to_f64), else a
    scalar of the arithmetic dtype; `res_dtype` requests a final cast — the
    ``cast_result`` analogue (``cuda/dot_kernels.cuh:168-173``).
    """
    ar = dtypes.check_arithmetic(ar)
    hi, lo = _dot_call(x, y, ar, precise=precise, interpret=interpret, init=init,
                       resident=resident)
    if ar == "df64":
        out = dfm.DF(hi, lo)
        if res_dtype is not None:
            rd = dtypes.canon(res_dtype)
            if rd == "f64":
                # wider-than-f32 request: keep the df64 width. Trace-safe
                # exact sum (the store_cast f64 path) — df_to_f64 goes via
                # numpy and would raise TracerArrayConversionError under jit.
                return out.hi.astype(jnp.float64) + out.lo.astype(jnp.float64)
            return dfm.df_to_f32(out).astype(dtypes.jnp_dtype(rd))
        return out
    out = hi.astype(dtypes.jnp_dtype(ar))
    if res_dtype is not None:
        out = out.astype(dtypes.jnp_dtype(dtypes.canon(res_dtype)))
    return out


def xla_dot(x, y):
    """Vendor-baseline tier: XLA's own dot (the cublas_dot analogue,
    ``cuda/dot_kernels.cuh:268-299``).

    f32 operands run at HIGHEST precision: the TPU default truncates f32 dot
    operands to bf16, which would make the 'XLA DOT fp32' baseline label a lie
    (the reference's cuBLAS fp32 tier is genuine IEEE f32). Narrow operands
    (bf16/f16) are natively exact on the MXU — no override needed. The gate
    checks BOTH operands: a mixed bf16/f32 pair promotes to an f32 dot whose
    f32 side the default would truncate.
    """
    prec = (jax.lax.Precision.HIGHEST
            if jnp.float32 in (x.dtype, y.dtype) else None)
    return jnp.dot(x, y, precision=prec)
