"""On-device benchmark data with a host-replayable fp64 master copy.

The reference generates master data in fp64 on the host and copies it to the
GPU (``cuda/matrix_helper.cuh:28-50``, ``cuda/dot_memory.cuh:91-96``). Through
a remote-TPU tunnel that copy costs ~30 s/GiB, which makes the published
endpoint sweeps (DOT n≈5.4e8, GEMV 24500² — multi-GiB operands, ×10 error
re-randomizations) infeasible as transfers. This module replaces the *copy*
with a *replay*: JAX's threefry PRNG is bit-identical across CPU and TPU
backends (verified at import-from-test time), so the device generates its own
storage copies in milliseconds and the host independently reconstructs the
exact fp64 master for the oracle — no bulk transfer in either direction.

Master-value construction: two independent uniform(-1,1) float32 draws
``a, b`` combine as

    master = fl64(a + 2^-24 * b)

(The sum is exact in float64 whenever the operands' exponents are within 5
of each other — the combined span is then ≤ 53 bits; for the ~1% of draws
with exp(a) − exp(b) > 5 the f64 add rounds off trailing bits of b at the
≤ 2^-53 relative level. Host and device compute the identical fl64 value —
the replay contract — and the dropped bits sit ~5 decades below the df64
oracle floor, so no measured error metric can see them; only "master ==
a + 2^-24·b exactly as a real number" would be overstated.)

- The distribution is uniform(-1,1) (the reference's, ``dot_benchmark.cu:72``),
  with ~48 significant bits — entropy below every error floor measured here
  (f32 storage 2^-24, df64 arithmetic 2^-48 ⋍ the 48-bit master itself; the
  device df64 oracle splits the master EXACTLY, see ops.oracle).
- The f32 storage copy is ``fl32(master)`` — computable on device by a single
  f32 add ``a + 2^-24 * b`` (the scale is a power of two, so the product is
  exact and the add performs the one correct rounding).
- The perturbation spans ≥ ±1 ulp32 for every magnitude in (-1, 1), so the
  f32 storage-rounding error keeps the same uniform ±0.5 ulp statistics as a
  full-entropy fp64 master — the property the accessor error plots measure.
- Narrower storage copies derive from the f32 copy on device (bf16/f16 cast;
  f8 via utils.sr stochastic rounding). The double rounding master→f32→bf16
  differs from the reference's direct master→storage cast only on exact
  rounding boundaries (measure-zero for continuous draws).
- Subnormals can't occur (|a| < 1 uniform; P(|master| < 2^-126) ≈ 0), which
  satisfies the reference's isnormal filter (``cuda/matrix_helper.cuh:42-45``)
  without per-element resampling.
"""

from __future__ import annotations

import numpy as np

SCALE = np.float32(2.0**-24)

# role tags keep the streams of different operands disjoint; the benchmark
# drivers' roles are pinned to small ids (CSV bit-compat), ad-hoc roles
# (probes) fold in a stable CRC32 of the tag instead
ROLES = {"dot_x": 0, "dot_y": 1, "gemv_a": 2, "gemv_x": 3, "gemv_res": 4,
         "trsv_b": 5, "sr": 6}


def _key(seed: int, role: str, r: int):
    import jax

    rid = ROLES.get(role)
    if rid is None:
        import zlib

        # crc32 is stable across processes (unlike hash()); keep it in
        # int32 range for fold_in
        rid = zlib.crc32(role.encode()) & 0x7FFFFFFF
    k = jax.random.key(seed)
    k = jax.random.fold_in(k, rid)
    return jax.random.fold_in(k, r)


def _draws(seed: int, role: str, r: int, shape):
    import jax
    import jax.numpy as jnp

    k = _key(seed, role, r)
    ka, kb = jax.random.split(k)
    a = jax.random.uniform(ka, shape, jnp.float32, -1.0, 1.0)
    b = jax.random.uniform(kb, shape, jnp.float32, -1.0, 1.0)
    return a, b


def gen_f32(shape, seed: int = 42, role: str = "dot_x", r: int = 0):
    """The f32 storage copy fl32(master), generated on the default device."""
    import jax
    import jax.numpy as jnp

    def f():
        a, b = _draws(seed, role, r, shape)
        return a + SCALE * b

    return jax.jit(f)()


def master_f64(shape, seed: int = 42, role: str = "dot_x", r: int = 0) -> np.ndarray:
    """Host replay of the exact fp64 master (for the numpy oracle)."""
    import jax

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        a, b = _draws(seed, role, r, shape)
        a64 = np.asarray(a, np.float64)
        b64 = np.asarray(b, np.float64)
    return a64 + float(SCALE) * b64


def split_df64(x32, master_shape=None, seed: int = 42, role: str = "dot_x", r: int = 0):
    """Exact (hi, lo) f32 split of the master, computed on device.

    hi = fl32(master) is the f32 copy; lo = (a - hi) + s*b recovers the
    rounding residue: (a - hi) is Sterbenz-exact (hi ≈ a) except for the
    ~2^-24 fraction of near-zero draws, s*b is exact, and the final add
    rounds once at ulp(lo) — so (hi, lo) carries the master to ~2^-48
    relative, i.e. to df64's own precision. Used by the device-side df64
    oracle (ops.oracle) as the cuBLAS-fp64-analogue input.
    """
    import jax
    import jax.numpy as jnp

    def f():
        a, b = _draws(seed, role, r, x32.shape if master_shape is None else master_shape)
        hi = a + SCALE * b
        lo = (a - hi) + SCALE * b
        return hi, lo

    return jax.jit(f)()
