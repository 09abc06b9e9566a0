"""Data-manager layer (utils.memory) + fp16 storage coverage."""

import numpy as np
import jax.numpy as jnp

from accblas_tpu.ops import dot as dotops
from accblas_tpu.utils.memory import DotData, GemvData, TrsvData, to_host


def test_dot_data_roundtrip_and_randomize():
    d = DotData(4096, seed=42)
    x32 = d.x_in(np.float32)
    assert x32.dtype == jnp.float32
    np.testing.assert_allclose(to_host(x32), d.x, rtol=1e-7)
    ref0 = d.reference()
    d.randomize(seed=99)
    assert d.reference() != ref0
    # caches invalidated
    np.testing.assert_allclose(to_host(d.x_in(np.float32)), d.x, rtol=1e-7)


def test_gemv_data_views_share_master():
    g = GemvData(512, seed=1)
    a, x, r = g.view(256, "bfloat16")
    assert a.shape == (256, 256) and a.dtype == jnp.bfloat16
    ref = g.reference(256)
    got = to_host(a) @ to_host(x) + to_host(r)
    assert np.linalg.norm(got - ref, 1) / np.linalg.norm(ref, 1) < 0.02  # bf16 floor


def test_trsv_data_factorized_and_reset():
    t = TrsvData(512, seed=3, diag_boost=128.0)
    a, b = t.view(512, np.float32)
    ref = t.reference(512, uplo="upper", unit=False)
    assert np.all(np.isfinite(ref))
    t.b[:10] = 0.0
    t.reset_x()
    np.testing.assert_array_equal(t.b, t.x_init)


def test_fp16_storage_through_accessor():
    d = DotData(65536, seed=7)
    xh = d.x_in(np.float16)
    yh = d.y_in(np.float16)
    assert xh.dtype == jnp.float16
    ref_stored = np.asarray(xh, np.float64) @ np.asarray(yh, np.float64)
    got = float(dotops.acc_dot(xh, yh, ar="f32"))
    assert abs(got - ref_stored) / abs(ref_stored) < 1e-4


def test_dev_cache_key_canonical():
    import jax.numpy as jnp
    from accblas_tpu.utils.memory import DotData

    d = DotData(64)
    a1 = d.x_in("bf16")
    a2 = d.x_in(jnp.bfloat16)
    assert a1 is a2, "equivalent dtype spellings must share one cache slot"


def test_reset_x_keeps_matrix_cached():
    from accblas_tpu.utils.memory import TrsvData

    t = TrsvData(64)
    a1, _ = t.view(64, "f32")
    t.reset_x()
    a2, _ = t.view(64, "f32")
    assert a1 is a2, "reset_x must not drop the unchanged LU matrix"


def test_to_device_narrow_payload_host_cast():
    import numpy as np
    import jax.numpy as jnp
    from accblas_tpu.utils.memory import to_device

    x = np.random.default_rng(0).uniform(-1, 1, 128)
    d = to_device(x, "bf16")
    assert d.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(d.astype(jnp.float32)),
        x.astype(jnp.bfloat16).astype(np.float32),
    )
