"""Native C++ host library vs the numpy reference implementations.

The counter-based generator must be bit-identical across the two paths; the
long-double reductions must agree with the numpy fp64 tree reduce to fp64
precision.
"""

import numpy as np
import pytest

from accblas_tpu.native import host as native
from accblas_tpu.utils import MatrixInfo, gen_mtx
from accblas_tpu.utils.compare import tree_reduce

needs_native = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


@needs_native
def test_gen_mtx_bit_identical():
    import os

    os.environ["ACCBLAS_NO_NATIVE"] = "1"
    try:
        ref = gen_mtx(MatrixInfo(37, 53, 64), seed=42)
    finally:
        del os.environ["ACCBLAS_NO_NATIVE"]
    got = native.gen_mtx(37, 53, 64, 42, -1.0, 1.0)
    np.testing.assert_array_equal(got, ref)


@needs_native
def test_norms_match_tree_reduce(rng):
    a = rng.uniform(-1, 1, 100_001)
    b = rng.uniform(-1, 1, 100_001)
    got = native.abs_diff_norm1(a, b)
    ref = tree_reduce(np.abs(a - b))
    assert abs(got - ref) / ref < 1e-14
    assert abs(native.norm1(a) - tree_reduce(np.abs(a))) / native.norm1(a) < 1e-14


@needs_native
def test_convert_bf16_rne():
    import ml_dtypes

    a = np.array([1.0, 1.0039062500001, -0.3007812, 3.0e38, 1e-40], np.float64)
    got = native.convert_f64_bf16(a)
    ref = a.astype(np.float32).astype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(got.view(np.uint16), ref.view(np.uint16))


@needs_native
def test_convert_f32():
    a = np.linspace(-2, 2, 1000)
    np.testing.assert_array_equal(native.convert_f64_f32(a), a.astype(np.float32))


def test_gen_mtx_subnormal_filter_and_stride():
    m = gen_mtx(MatrixInfo(16, 10, 12), seed=7)
    assert m.shape == (16, 12)
    view = m[:, :10]
    assert np.all(np.abs(view) >= np.finfo(np.float32).tiny)
    assert np.all(np.abs(view) <= 1.0)
    np.testing.assert_array_equal(m[:, 10:], 0.0)
    # determinism
    np.testing.assert_array_equal(m, gen_mtx(MatrixInfo(16, 10, 12), seed=7))
