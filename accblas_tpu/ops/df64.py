"""Double-float (df64) arithmetic: fp64-class accumulation built from fp32 pairs.

TPUs have no native float64 ALUs, so the role that ``double`` arithmetic plays in
the reference (storage fp32, arithmetic fp64 — e.g. the Accessor<fp64, fp32>
variants driven by ``acc_dot``/``acc_gemv``/``acc_trsv`` in the reference's
``cuda/dot_kernels.cuh:224``, ``cuda/gemv_kernels.cuh:168``,
``cuda/trsv_kernels.cuh:918``) is played here by *double-float* arithmetic: every
value is an unevaluated sum ``hi + lo`` of two float32s, giving ~49 bits of
significand (~2^-48 relative rounding, vs 2^-53 for true fp64 and 2^-24 for
fp32). All operations are error-free-transform based (Dekker/Knuth/Møller) and
compile to plain VPU mul/add/sub, so they run inside Pallas kernels and under
``jit`` alike.

The acceptance criterion (SURVEY.md §6) is that accessor mixed-precision error is
pinned at the fp32 *storage* rounding floor (~1e-7) independent of accumulation
length n — df64's 2^-48 accumulator noise is negligible against that floor, so
df64 is a faithful stand-in for the reference's fp64 arithmetic tier.

No code is taken from the reference; the EFT identities are textbook
(Dekker 1971, Knuth TAOCP vol. 2).

Backend faithfulness note: EFTs require each float op to be IEEE-rounded
individually. Mosaic (Pallas on TPU) and XLA:TPU honor this — verified against
a numpy float64 oracle on hardware. XLA:**CPU** at its default backend
optimization level duplicates producers into consumer loops and lets LLVM
contract mul+add into FMA, which silently breaks two_sum/two_prod
compositions; run CPU tests/debug sessions with
``XLA_FLAGS=--xla_backend_optimization_level=0`` (tests/conftest.py does).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "DF",
    "two_sum",
    "fast_two_sum",
    "two_prod",
    "df_from",
    "df_add",
    "df_sub",
    "df_mul",
    "df_mul_f32",
    "df_neg",
    "df_to_f32",
    "df_to_f64",
    "df_zeros",
    "df_sum",
    "cascaded_fold",
    "cascaded_fold_mid",
    "df_fold_rows",
    "df_fold_lanes",
]

# 2^12 + 1: Dekker split constant for float32. Kept as a Python literal (not a
# jnp array) so kernels using it don't capture a traced constant.
_SPLIT = 4097.0  # Dekker/Veltkamp constant, kept for the multiply-split form


def two_sum(a, b):
    """Error-free sum: returns (s, e) with s = fl(a+b) and s + e == a + b exactly."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free sum assuming |a| >= |b| (Dekker)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    """Veltkamp multiply split (11/12-bit halves, |lo| <= ulp(hi)/2).

    |a| > ~2^115 would overflow the ``_SPLIT * a`` step (inf - inf -> NaN
    error terms for products that are themselves finite, e.g.
    2^120 * 2^-100); pre-scale those operands by an exact power of two so
    this fallback matches the mask split's full-range validity.
    """
    big = jnp.abs(a) > jnp.float32(2.0**115)
    a_s = jnp.where(big, a * jnp.float32(2.0**-32), a)
    c = _SPLIT * a_s
    hi = c - (c - a_s)
    lo = a_s - hi
    up = jnp.where(big, jnp.float32(2.0**32), jnp.float32(1.0))
    return hi * up, lo * up


def _split_mask(a):
    """Truncation split via mantissa masking: hi keeps the sign/exponent and
    the top 11 mantissa bits, lo = a - hi (exact, ≤12-bit significand).

    Cheaper than the Veltkamp multiply split on the VPU (bitwise ops, no
    multiply, no rounding) and the resulting two_prod is verified exact over
    10^6 random pairs (p + e == a·b bit-for-bit, tests/test_df64.py) — both
    halves stay ≤12 significand bits so every partial product below fits
    float32 exactly, and the Dekker-order correction sums remain exact."""
    ai = jax.lax.bitcast_convert_type(a, jnp.int32)
    hi = jax.lax.bitcast_convert_type(ai & jnp.int32(-4096), jnp.float32)
    return hi, a - hi


def two_prod(a, b):
    """Error-free product: (p, e) with p = fl(a*b), p + e == a*b exactly.

    Mask-split halves (no FMA dependence; TPU VPU ops are individually
    rounded, which is exactly what the EFT needs). 15 VPU ops vs the
    multiply-split form's 17 — the df64 DOT precise kernel is VPU-op-bound,
    so the cut shows up directly as throughput (measured 160→~180 GF/s at
    n=2^27 on v5e)."""
    p = a * b
    # The mask split's bitcast is only safe under Mosaic for lane-aligned
    # vector shapes: scalars are rejected outright (tpu.bitcast wants
    # vectors) and narrow trailing dims like the epilogue's (bm, 1) fold
    # output crash the compiler during relayout. Gate by shape; the
    # multiply split is the universal fallback (identical EFT, 2 ops more).
    def _sp(v):
        if jnp.ndim(v) >= 1 and v.shape[-1] % 128 == 0:
            return _split_mask(v)
        return _split(v)

    ah, al = _sp(a)
    bh, bl = _sp(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


@jax.tree_util.register_pytree_node_class
class DF:
    """A double-float value: unevaluated sum hi + lo of two float32 arrays.

    Behaves like a jnp array for +, -, * against DF or float32 operands, so
    generic accessor kernels (written once against ranges, reference pattern
    ``cuda/gemv_kernels.cuh:79-113``) work unchanged when the arithmetic type
    is df64.
    """

    __slots__ = ("hi", "lo")

    def __init__(self, hi, lo):
        self.hi = hi
        self.lo = lo

    # pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return (self.hi, self.lo), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # shape/dtype conveniences ------------------------------------------
    @property
    def shape(self):
        return jnp.shape(self.hi)

    @property
    def ndim(self):
        return jnp.ndim(self.hi)

    def __getitem__(self, idx):
        return DF(self.hi[idx], self.lo[idx])

    def reshape(self, *shape):
        return DF(self.hi.reshape(*shape), self.lo.reshape(*shape))

    # arithmetic --------------------------------------------------------
    def __add__(self, other):
        return df_add(self, df_from(other))

    __radd__ = __add__

    def __sub__(self, other):
        return df_sub(self, df_from(other))

    def __rsub__(self, other):
        return df_sub(df_from(other), self)

    def __mul__(self, other):
        if isinstance(other, DF):
            return df_mul(self, other)
        # f32 (or python-scalar) operand: cheaper df_mul_f32 path — no
        # promotion first, which would hide this fast path forever.
        return df_mul_f32(self, jnp.asarray(other, jnp.float32))

    __rmul__ = __mul__

    def __neg__(self):
        return df_neg(self)

    def __repr__(self):
        return f"DF(hi={self.hi!r}, lo={self.lo!r})"


def df_from(x) -> DF:
    """Promote a float32 array (or python scalar) to DF exactly."""
    if isinstance(x, DF):
        return x
    x = jnp.asarray(x, jnp.float32)
    return DF(x, jnp.zeros_like(x))


def df_zeros(shape) -> DF:
    z = jnp.zeros(shape, jnp.float32)
    return DF(z, z)


def df_add(x: DF, y: DF) -> DF:
    s, e = two_sum(x.hi, y.hi)
    e = e + (x.lo + y.lo)
    hi, lo = fast_two_sum(s, e)
    return DF(hi, lo)


def df_sub(x: DF, y: DF) -> DF:
    return df_add(x, df_neg(y))


def df_neg(x: DF) -> DF:
    return DF(-x.hi, -x.lo)


def df_mul(x: DF, y: DF) -> DF:
    p, e = two_prod(x.hi, y.hi)
    e = e + (x.hi * y.lo + x.lo * y.hi)
    hi, lo = fast_two_sum(p, e)
    return DF(hi, lo)


def df_mul_f32(x: DF, y) -> DF:
    """DF * float32 (cheaper than full df_mul)."""
    p, e = two_prod(x.hi, y)
    e = e + x.lo * y
    hi, lo = fast_two_sum(p, e)
    return DF(hi, lo)


def df_to_f32(x: DF):
    """Round DF to nearest float32 (accessor cast-on-store to fp32 storage)."""
    return x.hi + x.lo


def df_to_f64(x: DF):
    """Exact value as float64 — host-side only (needs x64 or numpy)."""
    import numpy as np

    return np.asarray(x.hi, np.float64) + np.asarray(x.lo, np.float64)


def cascaded_fold(p, out_rows: int = 8, err=None) -> DF:
    """Error-compensated pairwise fold of a float32 (R, L) tile to DF(out_rows, L).

    The fast path of df64 accumulation inside kernels: each halving level uses
    two_sum (exact), and the rounding terms are themselves folded in a plain
    f32 side-channel (their own rounding errors are O(eps^2) — negligible).
    Cost ~8 VPU ops per input element, vs ~20+ for a full df_add tree, which
    keeps bandwidth-bound kernels (DOT/GEMV) at the HBM roofline.

    This is the TPU replacement for the reference's per-thread fp64 partials +
    shared-memory block reduce (``cuda/kernel_utils.cuh:69-89``,
    ``cuda/dot_kernels.cuh:87-116``): lane-parallel partials with an exact
    compensation term instead of warp shuffles.

    `err`: optional initial per-element error array of the same shape as `p`
    (e.g. the two_prod low words in precise mode).

    Any leading size works (odd leftovers are peeled per level); the result
    is zero-padded up to `out_rows` rows if the fold lands below it.
    """
    s = p
    if err is None:
        err = jnp.zeros_like(s)
    while s.shape[0] > out_rows:
        half = s.shape[0] // 2
        s_new, e = two_sum(s[:half], s[half : 2 * half])
        err_new = err[:half] + err[half : 2 * half] + e
        if s.shape[0] % 2:
            # fold the odd leftover row into row 0 (exactly); avoid
            # zero-size slices when only one row remains (Mosaic rejects
            # 0-extent vectors)
            s0, e0 = two_sum(s_new[:1], s[2 * half :])
            e_row0 = err_new[:1] + e0 + err[2 * half :]
            if s_new.shape[0] > 1:
                s_new = jnp.concatenate([s0, s_new[1:]], 0)
                err_new = jnp.concatenate([e_row0, err_new[1:]], 0)
            else:
                s_new, err_new = s0, e_row0
        s, err = s_new, err_new
    if s.shape[0] < out_rows:
        pad = out_rows - s.shape[0]
        z = jnp.zeros((pad,) + s.shape[1:], s.dtype)
        s = jnp.concatenate([s, z], 0)
        err = jnp.concatenate([err, z], 0)
    return DF(s, err)


def cascaded_fold_mid(p, err=None) -> DF:
    """Error-compensated fold of (M, K, L) float32 over the middle axis → DF(M, L).

    The GEMV row-sum analogue of cascaded_fold: per-row partial sums across a
    column block, exact via two_sum trees with an f32 error side-channel.
    K must be a power of two.
    """
    s = p
    k = s.shape[1]
    assert k > 0 and (k & (k - 1)) == 0, k
    while s.shape[1] > 1:
        half = s.shape[1] // 2
        s, e = two_sum(s[:, :half], s[:, half:])
        err = e if err is None else err[:, :half] + err[:, half:] + e
    # err folds in lockstep with s, so it is already (M, 1) here (or was
    # provided as (M, 1) when K == 1).
    if err is None:
        err = jnp.zeros_like(s)
    return DF(s[:, 0], err[:, 0])


def df_fold_rows(x: DF, out_rows: int = 1) -> DF:
    """Pairwise df_add fold of DF (R, L) rows down to (out_rows, L)."""
    cur = x
    rows = cur.shape[0]
    # out_rows must itself be a power of two so the halving loop lands on it
    # exactly (8 -> 3 would silently stop at 2).
    assert (
        0 < out_rows <= rows
        and (rows & (rows - 1)) == 0
        and (out_rows & (out_rows - 1)) == 0
    ), (rows, out_rows)
    while cur.shape[0] > out_rows:
        half = cur.shape[0] // 2
        cur = df_add(cur[:half], cur[half:])
    return cur


def df_fold_lanes(x: DF, out_lanes: int = 1) -> DF:
    """Pairwise df_add fold along the last (lane) axis."""
    cur = x
    lanes = cur.shape[-1]
    assert (
        0 < out_lanes <= lanes
        and (lanes & (lanes - 1)) == 0
        and (out_lanes & (out_lanes - 1)) == 0
    ), (lanes, out_lanes)
    while cur.shape[-1] > out_lanes:
        half = cur.shape[-1] // 2
        cur = df_add(
            DF(cur.hi[..., :half], cur.lo[..., :half]),
            DF(cur.hi[..., half:], cur.lo[..., half:]),
        )
    return cur


def df_sum(x: DF, axis=None) -> DF:
    """Compensated reduction of a DF array.

    Folds the array pairwise (binary tree) with df_add so every partial stays a
    double-float — the TPU analogue of the reference's accurate tree ``reduce``
    (``cuda/utils.cuh:281-300``) and of accumulating in fp64 registers inside the
    CUDA kernels. axis=None reduces everything to a scalar DF; an int axis
    reduces that axis (must have power-of-two-friendly folding: we peel odd
    leftovers each level, so any length works).
    """
    if axis is None:
        flat = x.reshape(-1)
        n = flat.shape[0]
        cur = flat
        while n > 1:
            half = n // 2
            lo_part = DF(cur.hi[:half], cur.lo[:half])
            hi_part = DF(cur.hi[half : 2 * half], cur.lo[half : 2 * half])
            folded = df_add(lo_part, hi_part)
            if n % 2:
                tail = DF(cur.hi[2 * half :], cur.lo[2 * half :])
                folded = DF(
                    jnp.concatenate([folded.hi, tail.hi]),
                    jnp.concatenate([folded.lo, tail.lo]),
                )
                n = half + 1
            else:
                n = half
            cur = folded
        return DF(cur.hi[0], cur.lo[0])

    # axis reduction via moveaxis + the same fold
    hi = jnp.moveaxis(x.hi, axis, 0)
    lo = jnp.moveaxis(x.lo, axis, 0)
    cur = DF(hi, lo)
    n = hi.shape[0]
    while n > 1:
        half = n // 2
        folded = df_add(
            DF(cur.hi[:half], cur.lo[:half]),
            DF(cur.hi[half : 2 * half], cur.lo[half : 2 * half]),
        )
        if n % 2:
            # carry the odd leftover slice to the next level (concatenate,
            # not .at[0].set — scatter doesn't lower inside Pallas kernels)
            folded = DF(
                jnp.concatenate([folded.hi, cur.hi[2 * half :]], 0),
                jnp.concatenate([folded.lo, cur.lo[2 * half :]], 0),
            )
            n = half + 1
        else:
            n = half
        cur = folded
    return DF(cur.hi[0], cur.lo[0])
