"""On-device data-generation protocol tests (utils.devgen).

The cross-backend (CPU vs TPU) bit-identity of threefry — the property that
makes the zero-transfer protocol sound — was verified on real hardware
(BENCH_NOTES.md, round-2 probe); these tests pin the host-side algebra.
"""

import numpy as np
import jax.numpy as jnp

from accblas_tpu.utils import devgen


def test_f32_copy_is_rounded_master():
    g = np.asarray(devgen.gen_f32((4096,), seed=42, role="dot_x", r=0))
    m = devgen.master_f64((4096,), seed=42, role="dot_x", r=0)
    assert np.array_equal(g, m.astype(np.float32))


def test_master_distribution_and_entropy():
    m = devgen.master_f64((20000,), seed=42, role="dot_y", r=1)
    assert np.all(np.abs(m) < 1.0 + 2.0**-24)
    assert abs(m.mean()) < 0.02 and abs(m.std() - 1 / np.sqrt(3)) < 0.01
    # the master must NOT be f32-representable (that would zero the storage-
    # rounding error the accessor tiers measure)
    frac_exact = np.mean(m.astype(np.float32).astype(np.float64) == m)
    assert frac_exact < 0.01
    # storage-rounding error must have the ±0.5 ulp statistics of a full-
    # entropy master: mean |err| over mean ulp ≈ 0.25
    f32 = m.astype(np.float32).astype(np.float64)
    err = np.abs(m - f32)
    ulp = np.abs(np.nextafter(f32.astype(np.float32), np.float32(np.inf)).astype(np.float64) - f32)
    assert 0.2 < np.mean(err / ulp) < 0.3


def test_split_recovers_master_exactly_enough():
    hi, lo = devgen.split_df64(None, master_shape=(8192,), seed=42, role="gemv_x", r=0)
    m = devgen.master_f64((8192,), seed=42, role="gemv_x", r=0)
    rec = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    # (hi, lo) carries the master to df64 precision (~2^-48 relative)
    assert np.max(np.abs(rec - m) / np.maximum(np.abs(m), 1e-6)) < 2.0**-45
    assert np.array_equal(np.asarray(hi), m.astype(np.float32))


def test_roles_and_randomizations_are_disjoint_streams():
    a = devgen.master_f64((1000,), seed=42, role="dot_x", r=0)
    b = devgen.master_f64((1000,), seed=42, role="dot_y", r=0)
    c = devgen.master_f64((1000,), seed=42, role="dot_x", r=1)
    d = devgen.master_f64((1000,), seed=43, role="dot_x", r=0)
    assert not np.array_equal(a, b)
    assert not np.array_equal(a, c)
    assert not np.array_equal(a, d)


def test_gen_2d_shape():
    g = np.asarray(devgen.gen_f32((64, 128), seed=42, role="gemv_a", r=0))
    m = devgen.master_f64((64, 128), seed=42, role="gemv_a", r=0)
    assert g.shape == (64, 128)
    assert np.array_equal(g, m.astype(np.float32))

def test_adhoc_roles_stable_and_disjoint():
    # probe scripts use unregistered role tags: deterministic across calls,
    # disjoint from each other and from the pinned driver roles, and the
    # host master replay still matches the device f32 copy exactly
    a1 = np.asarray(devgen.gen_f32((512,), seed=42, role="p4a_a"))
    a2 = np.asarray(devgen.gen_f32((512,), seed=42, role="p4a_a"))
    b = np.asarray(devgen.gen_f32((512,), seed=42, role="p4a_x"))
    assert np.array_equal(a1, a2)
    assert not np.array_equal(a1, b)
    for role in devgen.ROLES:
        pinned = np.asarray(devgen.gen_f32((512,), seed=42, role=role))
        assert not np.array_equal(a1, pinned)
    m = devgen.master_f64((512,), seed=42, role="p4a_a")
    assert np.array_equal(a1, m.astype(np.float32))
