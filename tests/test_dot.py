"""DOT kernels vs numpy float64 oracle (Pallas interpret mode on CPU).

Covers BASELINE.json config 1 (DOT n=2^20 fp32/fp32 vs numpy fp64) plus the
mixed-precision pairs and the error-floor property (accessor error flat in n,
fixed-precision error grows).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from accblas_tpu.ops import dot as dotops
from accblas_tpu.ops import df64
from accblas_tpu.utils import MatrixInfo, gen_mtx


def _vecs(n, seed=42):
    x64 = gen_mtx(MatrixInfo(1, n), seed=seed)[0]
    y64 = gen_mtx(MatrixInfo(1, n), seed=seed + 1)[0]
    return x64, y64


def _rel(a, b):
    return abs(a - b) / abs(b)


@pytest.mark.parametrize("n", [1024, 2**17, 100_000, 777])
def test_dot_f32_fixed(n):
    x64, y64 = _vecs(n)
    ref = x64 @ y64
    x = jnp.asarray(x64, jnp.float32)
    y = jnp.asarray(y64, jnp.float32)
    got = float(dotops.dot(x, y))
    # fixed fp32: error grows with n but stays within a loose fp32 envelope
    assert _rel(got, ref) < 5e-5
    # must agree with an fp32-accumulated numpy computation to fp32 roundoff scale
    approx = np.float32(x64.astype(np.float32) @ y64.astype(np.float32))
    assert _rel(got, float(approx)) < 1e-4


@pytest.mark.parametrize("n", [2**16, 12345])
def test_acc_dot_df64_f32_storage(n):
    x64, y64 = _vecs(n)
    x = jnp.asarray(x64, jnp.float32)
    y = jnp.asarray(y64, jnp.float32)
    # oracle on the STORED (rounded) values — isolates arithmetic error
    ref_stored = np.asarray(x, np.float64) @ np.asarray(y, np.float64)
    out = dotops.acc_dot(x, y, ar="df64")
    got = float(df64.df_to_f64(out))
    assert _rel(got, ref_stored) < 5e-7  # fast mode: f32 product rounding only
    out_p = dotops.acc_dot(x, y, ar="df64", precise=True)
    got_p = float(df64.df_to_f64(out_p))
    assert _rel(got_p, ref_stored) < 1e-12  # precise mode: exact products


def test_acc_dot_error_flat_fixed_grows():
    """The headline property (BASELINE.md): accessor error pinned at the
    storage floor independent of n; fixed-fp32 arithmetic error grows."""
    errs_acc, errs_fixed = [], []
    for n in (2**12, 2**17):
        x64, y64 = _vecs(n, seed=3)
        ref = x64 @ y64
        x = jnp.asarray(x64, jnp.float32)
        y = jnp.asarray(y64, jnp.float32)
        errs_acc.append(_rel(float(df64.df_to_f64(dotops.acc_dot(x, y, ar="df64", precise=True))), ref))
        errs_fixed.append(_rel(float(dotops.dot(x, y)), ref))
    assert errs_acc[1] < 1e-6
    assert errs_acc[1] < 5 * errs_acc[0] + 1e-7  # flat-ish
    assert errs_fixed[1] > errs_acc[1]  # fixed fp32 is worse at large n


def test_acc_dot_bf16_storage_f32_arith():
    n = 2**16
    x64, y64 = _vecs(n, seed=5)
    xb = jnp.asarray(x64, jnp.float32).astype(jnp.bfloat16)
    yb = jnp.asarray(y64, jnp.float32).astype(jnp.bfloat16)
    ref_stored = np.asarray(xb.astype(jnp.float32), np.float64) @ np.asarray(
        yb.astype(jnp.float32), np.float64
    )
    got = float(dotops.acc_dot(xb, yb, ar="f32"))
    assert _rel(got, ref_stored) < 1e-5  # f32 accumulation over bf16 storage
    got_df = float(df64.df_to_f64(dotops.acc_dot(xb, yb, ar="df64", precise=True)))
    assert _rel(got_df, ref_stored) < 1e-12


def test_fixed_bf16_runs():
    n = 4096
    x64, y64 = _vecs(n, seed=9)
    xb = jnp.asarray(x64, jnp.float32).astype(jnp.bfloat16)
    yb = jnp.asarray(y64, jnp.float32).astype(jnp.bfloat16)
    got = dotops.dot(xb, yb)
    assert got.dtype == jnp.bfloat16
    ref = x64 @ y64
    assert _rel(float(got.astype(jnp.float32)), ref) < 0.3  # bf16 everything: coarse


def test_res_dtype_cast():
    n = 8192
    x64, y64 = _vecs(n, seed=11)
    x = jnp.asarray(x64, jnp.float32)
    y = jnp.asarray(y64, jnp.float32)
    out = dotops.acc_dot(x, y, ar="df64", res_dtype="f32")
    assert out.dtype == jnp.float32
    ref_stored = np.asarray(x, np.float64) @ np.asarray(y, np.float64)
    assert _rel(float(out), ref_stored) < 1e-6


def test_res_dtype_f64_under_jit():
    """res_dtype='f64' must be trace-safe (the exact hi+lo sum, not the
    numpy-based df_to_f64) and keep the full df64 width under x64."""
    n = 4096
    x64, y64 = _vecs(n, seed=12)
    with jax.enable_x64():
        x = jnp.asarray(x64, jnp.float32)
        y = jnp.asarray(y64, jnp.float32)
        f = jax.jit(lambda a, b: dotops.acc_dot(a, b, ar="df64",
                                                precise=True, res_dtype="f64"))
        out = f(x, y)
        assert out.dtype == jnp.float64
        ref = np.asarray(x, np.float64) @ np.asarray(y, np.float64)
        assert _rel(float(out), ref) < 1e-12


def test_xla_dot_baseline():
    n = 2**18
    x64, y64 = _vecs(n, seed=13)
    x = jnp.asarray(x64, jnp.float32)
    y = jnp.asarray(y64, jnp.float32)
    assert _rel(float(dotops.xla_dot(x, y)), x64 @ y64) < 5e-5


def test_dot_under_jit():
    n = 2**15
    x64, y64 = _vecs(n, seed=17)
    x = jnp.asarray(x64, jnp.float32)
    y = jnp.asarray(y64, jnp.float32)
    f = jax.jit(lambda a, b: dotops.acc_dot(a, b, ar="df64", precise=True))
    out = f(x, y)
    assert _rel(float(df64.df_to_f64(out)), np.asarray(x, np.float64) @ np.asarray(y, np.float64)) < 1e-12


def test_mixed_storage_dot():
    """Different storage dtypes per operand (x f32, y bf16) through the
    accessor — each Range carries its own spec."""
    n = 2**14
    x64, y64 = _vecs(n, seed=21)
    x = jnp.asarray(x64, jnp.float32)
    yb = jnp.asarray(y64, jnp.float32).astype(jnp.bfloat16)
    ref_stored = np.asarray(x, np.float64) @ np.asarray(yb.astype(jnp.float32), np.float64)
    got = float(dotops.acc_dot(x, yb, ar="f32"))
    assert _rel(got, ref_stored) < 1e-5
    got_df = float(df64.df_to_f64(dotops.acc_dot(x, yb, ar="df64", precise=True)))
    assert _rel(got_df, ref_stored) < 1e-12


def test_fixed_bf16_small_n_regression():
    # n <= 1024 bf16: block_rows (8 rows of 128) used to fall below the
    # (16, 128) bf16 accumulator tile -> zero-size reshape crash
    for n in (256, 512, 1024):
        x64 = gen_mtx(MatrixInfo(1, n), seed=21)[0]
        y64 = gen_mtx(MatrixInfo(1, n), seed=22)[0]
        xb = jnp.asarray(x64, jnp.float32).astype(jnp.bfloat16)
        yb = jnp.asarray(y64, jnp.float32).astype(jnp.bfloat16)
        got = dotops.dot(xb, yb)
        ref = float(
            np.asarray(xb.astype(jnp.float32), np.float64)
            @ np.asarray(yb.astype(jnp.float32), np.float64)
        )
        assert _rel(float(got.astype(jnp.float32)), ref) < 0.1


def test_acc_bf16_storage_small_n_regression():
    n = 512
    x64 = gen_mtx(MatrixInfo(1, n), seed=23)[0]
    y64 = gen_mtx(MatrixInfo(1, n), seed=24)[0]
    xb = jnp.asarray(x64, jnp.float32).astype(jnp.bfloat16)
    yb = jnp.asarray(y64, jnp.float32).astype(jnp.bfloat16)
    got = dotops.acc_dot(xb, yb, ar="f32")
    ref = float(
        np.asarray(xb.astype(jnp.float32), np.float64)
        @ np.asarray(yb.astype(jnp.float32), np.float64)
    )
    assert _rel(float(got), ref) < 1e-5


@pytest.mark.parametrize("ar_st", [("f32", jnp.float32), ("bf16", jnp.bfloat16)])
def test_dot_resident_mode_matches(ar_st):
    # the XLA-composed small-n mode must match the tier semantics
    ar, st = ar_st
    n = 10_000
    x64, y64 = _vecs(n, seed=51)
    x = jnp.asarray(x64, jnp.float32).astype(st)
    y = jnp.asarray(y64, jnp.float32).astype(st)
    ref = float(
        np.asarray(x.astype(jnp.float32), np.float64)
        @ np.asarray(y.astype(jnp.float32), np.float64)
    )
    got = dotops.dot(x, y, resident=True)
    tol = 1e-5 if ar == "f32" else 0.1
    assert _rel(float(got.astype(jnp.float32)), ref) < tol


def test_acc_dot_resident_df64():
    n = 100_000
    x64, y64 = _vecs(n, seed=53)
    x = jnp.asarray(x64, jnp.float32)
    y = jnp.asarray(y64, jnp.float32)
    ref = np.asarray(x, np.float64) @ np.asarray(y, np.float64)
    out = dotops.acc_dot(x, y, ar="df64", precise=True, resident=True)
    assert _rel(float(df64.df_to_f64(out)), ref) < 1e-12
    out_f = dotops.acc_dot(x, y, ar="df64", resident=True)
    assert _rel(float(df64.df_to_f64(out_f)), ref) < 5e-7
    # init seeding works in resident mode too
    out_i = dotops.dot(x, y, init=jnp.float32(2.5), resident=True)
    assert _rel(float(out_i), ref + 2.5) < 1e-5


@pytest.mark.parametrize("st", ["f8e4m3", "f8e5m2", "f16"])
def test_acc_dot_narrow_storage_tiers(st):
    """f16/f8 storage under f32 arithmetic: the f32 products of narrow
    storage values are exact, so the kernel result must match an fp64 dot of
    the STORED values to f32 accumulation error."""
    from accblas_tpu.accessor import dtypes
    from accblas_tpu.utils.sr import sr_round

    n = 8192
    x64, y64 = _vecs(n)
    x = jnp.asarray(sr_round(x64, st, seed=1))
    y = jnp.asarray(sr_round(y64, st, seed=2))
    ref_stored = np.asarray(x, np.float64) @ np.asarray(y, np.float64)
    got = float(dotops.acc_dot(x, y, ar="f32", resident=False))
    assert _rel(got, ref_stored) < 1e-5
    # df64 arithmetic over f8/f16 storage: at the df64 arithmetic floor
    got_df = float(df64.df_to_f64(dotops.acc_dot(x, y, ar="df64", resident=False)))
    assert _rel(got_df, ref_stored) < 1e-10


def test_f8_storage_error_floor_flat():
    """The flagship flat-error property extends down-lattice: the f8e4m3
    storage tier's relative error is pinned at the (SR-converted) storage
    floor ~2^-9, independent of n."""
    from accblas_tpu.utils.sr import sr_round

    errs = []
    for n in (2**12, 2**15):
        x64, y64 = _vecs(n)
        x8 = jnp.asarray(sr_round(x64, "f8e4m3", seed=3))
        y8 = jnp.asarray(sr_round(y64, "f8e4m3", seed=4))
        ref = x64 @ y64
        got = float(dotops.acc_dot(x8, y8, ar="f32", resident=False))
        errs.append(_rel(got, ref))
    for e in errs:
        assert 1e-4 < e < 0.1  # the f8 storage floor, not an arithmetic blowup
    assert errs[1] < errs[0] * 10  # flat-ish in n (no linear growth)


def test_fixed_tier_rejects_f8():
    x = jnp.zeros(256, jnp.float8_e4m3fn)
    with pytest.raises(ValueError, match="storage-only"):
        dotops.dot(x, x)
    with pytest.raises(ValueError, match="storage-only"):
        dotops.acc_dot(x, x, ar="f8e4m3")


def test_dot_df64_traced_init():
    """A loop-carried (traced) init must work in the resident df64 path —
    the benchmark-loop chaining pattern (review fix: np.float32(Tracer)
    raised ConcretizationTypeError)."""
    import jax

    n = 1024
    x64 = gen_mtx(MatrixInfo(1, n), seed=61)[0]
    y64 = gen_mtx(MatrixInfo(1, n), seed=62)[0]
    x = jnp.asarray(x64, jnp.float32)
    y = jnp.asarray(y64, jnp.float32)

    @jax.jit
    def f(x, y, c):
        out = dotops.acc_dot(x, y, ar="df64", init=c, resident=True)
        return out.hi + out.lo

    got = float(f(x, y, jnp.float32(3.0)))
    ref = float(np.asarray(x, np.float64) @ np.asarray(y, np.float64)) + 3.0
    assert abs(got - ref) / abs(ref) < 1e-6


def test_dot_df64_over_f64_exact_split():
    """f64 storage under df64 arithmetic loads as an exact two-word split
    (the accessor contract, range.load_cast) — NOT a single truncated f32.
    CPU/x64 only; accuracy must be df64-class (~1e-13), not f32-floor."""
    from jax import enable_x64

    from accblas_tpu.ops.df64 import df_to_f64

    n = 4096
    x64 = gen_mtx(MatrixInfo(1, n), seed=63)[0]
    y64 = gen_mtx(MatrixInfo(1, n), seed=64)[0]
    with enable_x64():
        x = jnp.asarray(x64, jnp.float64)
        y = jnp.asarray(y64, jnp.float64)
        out = dotops.acc_dot(x, y, ar="df64")
        got = float(df_to_f64(out))
    ref = x64 @ y64
    assert abs(got - ref) / abs(ref) < 1e-12


def test_dot_res_dtype_f64_keeps_width():
    """res_dtype='f64' must deliver the df64 width (hi+lo in f64), not a
    round-trip through f32 (the cast_result analogue, review fix)."""
    from jax import enable_x64

    n = 4096
    x64 = gen_mtx(MatrixInfo(1, n), seed=65)[0]
    y64 = gen_mtx(MatrixInfo(1, n), seed=66)[0]
    x = jnp.asarray(x64, jnp.float32)
    y = jnp.asarray(y64, jnp.float32)
    ref = np.asarray(x, np.float64) @ np.asarray(y, np.float64)
    with enable_x64():
        got = dotops.acc_dot(x, y, ar="df64", precise=True, res_dtype="f64")
        assert got.dtype == jnp.float64
        got = float(got)
    assert abs(got - ref) / abs(ref) < 1e-12


def test_dot_fixed_mixed_dtypes_rejected():
    n = 256
    x64 = gen_mtx(MatrixInfo(1, n), seed=67)[0]
    x = jnp.asarray(x64, jnp.float32)
    y = x.astype(jnp.bfloat16)
    with pytest.raises(ValueError, match="matching storage dtypes"):
        dotops.dot(x, y)


@pytest.mark.parametrize("n", [100_003, 2**17 + 130])
def test_ragged_bf16_xla_route_semantics(n):
    """The TPU-only zero-copy ragged route for the bf16 acc32 tier forces the
    XLA-composed mode (jnp.dot, exact f32 MXU accumulate over bf16) — pin its
    semantics at ragged sizes against the fp64 oracle on the stored values,
    alongside the streaming path the same call takes off-TPU."""
    x64, y64 = _vecs(n, seed=21)
    xb = jnp.asarray(x64, jnp.float32).astype(jnp.bfloat16)
    yb = jnp.asarray(y64, jnp.float32).astype(jnp.bfloat16)
    ref_stored = np.asarray(xb.astype(jnp.float32), np.float64) @ np.asarray(
        yb.astype(jnp.float32), np.float64
    )
    got_xla = float(dotops._dot_small(xb, yb, "f32", False, None)[0])
    assert _rel(got_xla, ref_stored) < 1e-5
    got_stream = float(dotops.acc_dot(xb, yb, ar="f32"))
    assert _rel(got_stream, ref_stored) < 1e-5


@pytest.mark.parametrize(
    "n",
    [
        2 * 2048 * 128 + 8192,   # 3 grid steps, partial final block (64 rows)
        2 * 2048 * 128 + 777,    # 1-D zero-copy layout: element tail too
    ],
)
def test_multi_step_partial_tail_block(n):
    """rows % block_rows != 0 with n_steps > 1 — the tail-only masking path.

    Round-5 finding: masking inline on EVERY grid step cost the VPU-bound
    bf16 tiers ~6% across the dense grid (355 vs 377 GF/s); the mask now
    runs only in the final (partial) block, so multi-step ragged sums must
    still drop the garbage tail exactly."""
    x64, y64 = _vecs(n, seed=33)
    x = jnp.asarray(x64, jnp.float32)
    y = jnp.asarray(y64, jnp.float32)
    ref = np.asarray(x, np.float64) @ np.asarray(y, np.float64)
    got = float(dotops.dot(x, y, resident=False))
    assert _rel(got, ref) < 5e-5
    out = dotops.acc_dot(x, y, ar="df64", precise=True, resident=False)
    assert _rel(float(df64.df_to_f64(out)), ref) < 1e-11
    out_fast = dotops.acc_dot(x, y, ar="df64", resident=False)
    assert _rel(float(df64.df_to_f64(out_fast)), ref) < 5e-7
    if n % 128 == 0:  # bf16 streaming kernel (ragged 1-D view is f32-only)
        xb = x.astype(jnp.bfloat16)
        yb = y.astype(jnp.bfloat16)
        ref_b = np.asarray(xb.astype(jnp.float32), np.float64) @ np.asarray(
            yb.astype(jnp.float32), np.float64
        )
        got_b = float(dotops.acc_dot(xb, yb, ar="f32", resident=False))
        assert _rel(got_b, ref_b) < 1e-5
        got_fixed = float(dotops.dot(xb, yb, resident=False).astype(jnp.float32))
        assert _rel(got_fixed, ref_b) < 0.3
