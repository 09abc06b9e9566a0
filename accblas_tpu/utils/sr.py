"""Stochastic-rounding precision converters.

The f8 storage tiers sit far enough below the master precision that
round-to-nearest conversion leaves a *biased* per-element error (up to half
of an e4m3 gap, ~3% relative), which accumulates coherently in long dots.
Stochastic rounding (SR) makes the conversion error zero-mean — the
accumulated error of a dot over SR-converted storage grows like sqrt(n)
instead of n, which is what makes an 8-bit storage tier usable under f32/df64
arithmetic (the same role ``convert_mtx`` plays for the f32 copies in the
reference, ``cuda/matrix_helper.cuh:93-103``, extended down-lattice).

Definition: for x between representable neighbors c <= x <= u,
SR(x) = u with probability (x - c)/(u - c), else c;  E[SR(x)] = x exactly.

Implementation: correctly-rounded cast first, then step the IEEE bit pattern
one unit toward the residual's direction through a monotone total-order
mapping (sign-magnitude -> lexicographic), and pick between the two neighbors
with probability |residual| / gap. Works for any of the narrow formats
(f8e4m3 / f8e5m2 / bf16 / f16); both a numpy host version and a jnp device
version are provided (statistically identical given the same uniforms; see
the ``sr_round_device`` docstring for the f32-vs-f64 threshold caveat).
"""

from __future__ import annotations

import numpy as np

from ..accessor import dtypes


def _uint_t(nbytes: int):
    return {1: np.uint8, 2: np.uint16}[nbytes]


def _monotone_np(bits: np.ndarray, nbits: int) -> np.ndarray:
    """IEEE bit pattern -> monotone unsigned key (int64 work dtype)."""
    b = bits.astype(np.int64)
    sign = 1 << (nbits - 1)
    mask = (1 << nbits) - 1
    return np.where(b & sign, mask - b, b | sign)


def _from_monotone_np(key: np.ndarray, nbits: int) -> np.ndarray:
    sign = 1 << (nbits - 1)
    mask = (1 << nbits) - 1
    return np.where(key & sign, key & ~sign & mask, mask - key).astype(np.int64)


def sr_round(src: np.ndarray, st, u: np.ndarray | None = None, seed: int = 0) -> np.ndarray:
    """Stochastically round `src` (f32/f64) to storage type `st`.

    `u`: optional uniforms in [0, 1) of src's shape (for replaying a device
    conversion host-side); default draws from numpy's Philox keyed by seed.
    """
    st = dtypes.canon(st)
    tgt = dtypes.jnp_dtype(st)
    tdt = np.dtype(tgt)
    nbits = tdt.itemsize * 8
    ut = _uint_t(tdt.itemsize)

    src64 = np.asarray(src, np.float64)
    c = src64.astype(tdt)  # round-to-nearest-even
    c64 = c.astype(np.float64)
    err = src64 - c64

    key = _monotone_np(c.view(ut), nbits)
    step = np.sign(err).astype(np.int64)
    nb_bits = _from_monotone_np(key + step, nbits).astype(ut).view(tdt)
    nb64 = nb_bits.astype(np.float64)

    gap = np.abs(nb64 - c64)
    with np.errstate(invalid="ignore", divide="ignore"):
        p = np.where(gap > 0, np.abs(err) / gap, 0.0)
    if u is None:
        u = np.random.Generator(np.random.Philox(seed)).random(src64.shape)
    out = np.where((u < p) & np.isfinite(nb64), nb_bits, c)
    return out.astype(tdt)


def sr_round_device(src, st, key):
    """Device-side SR: same algorithm in jnp (f32 input), uniforms from
    jax.random (threefry is bit-identical across CPU/TPU backends).

    Replay caveat: the host `sr_round` computes the acceptance probability in
    f64 while this path computes it in f32, so a host replay via
    ``sr_round(..., u=<same uniforms>)`` is *statistically* identical but not
    bit-exact — elements whose uniform lands within ~1 f32 ulp of the
    threshold (a ~2^-24 fraction) can round to the other neighbor. Bit-exact
    replay of THIS function is running this jnp code on the CPU backend with
    the same key."""
    import jax
    import jax.numpy as jnp

    st = dtypes.canon(st)
    tgt = dtypes.jnp_dtype(st)
    nbits = jnp.dtype(tgt).itemsize * 8
    uint = {8: jnp.uint8, 16: jnp.uint16}[nbits]

    x = src.astype(jnp.float32)
    c = x.astype(tgt)
    c32 = c.astype(jnp.float32)
    err = x - c32

    sign = 1 << (nbits - 1)
    mask = (1 << nbits) - 1
    b = jax.lax.bitcast_convert_type(c, uint).astype(jnp.int32)
    mono = jnp.where(b & sign, mask - b, b | sign)
    step = jnp.sign(err).astype(jnp.int32)
    k2 = mono + step
    nb = jnp.where(k2 & sign, k2 & (mask ^ sign), mask - k2).astype(uint)
    nbf = jax.lax.bitcast_convert_type(nb, tgt)
    nb32 = nbf.astype(jnp.float32)

    gap = jnp.abs(nb32 - c32)
    p = jnp.where(gap > 0, jnp.abs(err) / jnp.where(gap > 0, gap, 1.0), 0.0)
    u = jax.random.uniform(key, x.shape, jnp.float32)
    return jnp.where((u < p) & jnp.isfinite(nb32), nbf, c)


def sr_round_device_chunked(src, st, key, chunk: int = 2**26):
    """Chunked device SR for multi-GiB operands: the SR temporaries are
    ~4x the f32 input, which would not fit HBM next to a 2^29-element sweep
    allocation. Any shape: inputs are flattened internally and the result
    reshaped back (a silent no-chunk bypass for 2-D operands was exactly
    the OOM this function exists to prevent)."""
    import jax
    import jax.numpy as jnp

    shape = src.shape
    flat = src if src.ndim == 1 else src.reshape(-1)
    n = flat.shape[0]
    if n <= chunk:
        return sr_round_device(src, st, key)
    parts = []
    for i0 in range(0, n, chunk):
        k = jax.random.fold_in(key, i0 // chunk)
        parts.append(sr_round_device(flat[i0 : i0 + chunk], st, k))
    return jnp.concatenate(parts).reshape(shape)
