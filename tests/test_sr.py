"""Stochastic-rounding converter tests (utils.sr) — the f8 tier's data bridge."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from accblas_tpu.utils import sr
from accblas_tpu.accessor import dtypes


@pytest.mark.parametrize("st", ["f8e4m3", "f8e5m2", "bf16", "f16"])
def test_sr_outputs_are_neighbors(st, rng):
    x = rng.uniform(-1, 1, 20000)
    out = sr.sr_round(x, st, seed=7).astype(np.float64)
    rn = x.astype(dtypes.jnp_dtype(st)).astype(np.float64)
    # SR may differ from RN only by at most one representable step, and must
    # bracket x
    tdt = dtypes.jnp_dtype(st)
    gap_bound = np.abs(out - rn)
    # where they differ, |out - x| must be below one full gap (= |out - rn| + |rn - x| style bound)
    assert np.all((out <= np.maximum(x, rn) + gap_bound) & (out >= np.minimum(x, rn) - gap_bound))
    # and out must be exactly representable in the target
    assert np.array_equal(out.astype(tdt).astype(np.float64), out)


def test_sr_exact_probability():
    """A value 30% of the way between two e4m3 neighbors rounds up ~30% of
    the time — the defining SR property, with an exact binomial bound."""
    c = np.float64(0.5)  # representable in e4m3
    up = np.float64(0.5 + 0.0625)  # next e4m3 value (gap = 2^-4 at 0.5)
    x = np.full(40000, c + 0.3 * (up - c))
    out = sr.sr_round(x, "f8e4m3", seed=3).astype(np.float64)
    frac_up = np.mean(out == up)
    assert np.all((out == up) | (out == c))
    # binomial(40000, 0.3): std ~ 0.0023; 5 sigma
    assert abs(frac_up - 0.3) < 0.012


def test_sr_unbiased_vs_rn_biased():
    """On a value sitting asymmetrically in its gap, RN is deterministic
    (biased); SR's mean converges to the value itself."""
    c = np.float64(1.0)
    up = np.float64(1.125)  # e4m3 gap at 1.0 is 2^-3
    x = np.full(40000, c + 0.2 * (up - c))
    rn = x.astype(jnp.float8_e4m3fn).astype(np.float64)
    assert np.all(rn == c)  # RN truncates every one of them
    out = sr.sr_round(x, "f8e4m3", seed=5).astype(np.float64)
    assert abs(out.mean() - x[0]) < 0.05 * (up - c)


def test_sr_exact_values_fixed():
    """Representable values pass through untouched."""
    vals = np.array([0.5, -0.25, 1.0, 0.0, 448.0], np.float64)  # e4m3-exact
    out = sr.sr_round(vals, "f8e4m3", seed=1).astype(np.float64)
    assert np.array_equal(out, vals)


def test_sr_device_matches_host_statistics():
    """Device (jnp) SR: outputs are the same two neighbors with the same
    probabilities (checked statistically; bit-replay requires same uniforms)."""
    key = jax.random.key(11)
    x = jnp.full((40000,), 0.5 + 0.3 * 0.0625, jnp.float32)
    out = np.asarray(sr.sr_round_device(x, "f8e4m3", key).astype(jnp.float32), np.float64)
    assert np.all((out == 0.5) | (out == 0.5625))
    assert abs(np.mean(out == 0.5625) - 0.3) < 0.012


def test_convert_mtx_stochastic_route(rng):
    from accblas_tpu.utils.matrix import convert_mtx

    x = rng.uniform(-1, 1, 1000)
    out = convert_mtx(x, "f8e4m3", rounding="stochastic", seed=2)
    assert out.dtype == np.dtype(jnp.float8_e4m3fn)
    rn = convert_mtx(x, "f8e4m3")
    assert rn.dtype == np.dtype(jnp.float8_e4m3fn)


def test_convert_mtx_stochastic_wide_target_rejected(rng):
    from accblas_tpu.utils.matrix import convert_mtx

    with pytest.raises(ValueError):
        convert_mtx(rng.uniform(-1, 1, 16), "f32", rounding="stochastic")


def test_sr_round_device_chunked_2d(rng):
    import jax
    from accblas_tpu.utils import sr

    x = jnp.asarray(rng.uniform(-1, 1, (64, 32)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    out_chunked = sr.sr_round_device_chunked(x, "f8e4m3", key, chunk=512)
    assert out_chunked.shape == x.shape
    # chunked == flat-chunked reference, reshaped
    flat = sr.sr_round_device_chunked(x.reshape(-1), "f8e4m3", key, chunk=512)
    np.testing.assert_array_equal(
        np.asarray(out_chunked, np.float32), np.asarray(flat, np.float32).reshape(64, 32)
    )
