"""GEMV benchmark driver — the ``gemv_benchmark`` executable analogue
(reference ``cuda/gemv_benchmark.cu``).

Square sweep over leading views of one max_size allocation (the reference's
stride trick, ``cuda/gemv_benchmark.cu:211-215``); alpha = beta = 1
(``cuda/gemv_benchmark.cu:25-28``); flops mode reports GFLOP/s (2·n²), error
mode the 1-norm relative error vs the numpy fp64 oracle on master data
(``cuda/gemv_benchmark.cu:219-231``) — each variant executed once through
``benchmark_function(..., skip=True)`` (the reference's error-mode protocol,
``cuda/utils.cuh:236-262``).

Data is generated on device with a host-replayed fp64 master (utils.devgen;
see dot_benchmark's docstring — the 24500² published endpoint is a 2.4 GiB
operand, hours through the tunnel as a copy, milliseconds as a replay).
Columns extend the reference's set (``cuda/gemv_benchmark.cu:134-193``) with
f16 and stochastically-rounded f8e4m3 storage tiers, a precise df64 variant,
and — error mode only — the df64-over-split-f64 device oracle (the cuBLAS
fp64 cross-check line, ``cuda/utils.cuh:315-332``).
"""

from __future__ import annotations

import numpy as np

from . import common
from ..utils.bench import benchmark_function, benchmark_loop

MIN_SIZE = 128  # round 3: sweep the resident regime too (reference sweeps from n=100,
# cuda/gemv_benchmark.cu:30); 128 = one lane tile
DEFAULT_SIZE = 16384
ALIGN = 128
ALPHA, BETA = 1.0, 1.0

VARIANTS = [
    ("GEMV fp32", "f32", "fixed", {}),
    ("GEMV bf16", "bf16", "fixed", {}),
    # identity-accessor tiers (same storage and arithmetic type through the
    # Range): must match the fixed tiers — the accessor-is-zero-cost
    # demonstration (reference Acc<fp64,fp64>/Acc<fp32,fp32>,
    # ``cuda/gemv_benchmark.cu:134-193``)
    ("GEMV Acc<f32,f32>", "f32", "acc32", {}),
    ("GEMV Acc<bf16,bf16>", "bf16", "accbf16", {}),
    ("GEMV Acc<df64,f32>", "f32", "df", {}),
    ("GEMV Acc<df64,f32> precise", "f32", "df", {"precise": True}),
    ("GEMV Acc<f32,bf16>", "bf16", "acc32", {}),
    ("GEMV Acc<df64,bf16>", "bf16", "df", {}),
    ("GEMV Acc<f32,f16>", "f16", "acc32", {}),
    ("GEMV Acc<f32,f8e4m3>", "f8", "acc32", {}),
    ("XLA GEMV fp32", "f32", "xla", {}),
    ("XLA GEMV bf16", "bf16", "xla", {}),
    ("GEMV df64 oracle (device)", "oracle", "oracle", {}),  # error mode only
]


def _lead2(a, n: int):
    if a.ndim == 2:
        return a if a.shape == (n, n) else a[:n, :n]
    return a if a.shape[0] == n else a[:n]


def _family_arrays(fam: str, a32, x32, seed: int):
    import jax
    import jax.numpy as jnp

    from ..utils import devgen
    from ..utils.sr import sr_round_device_chunked

    if fam == "f32":
        return a32, x32
    if fam in ("bf16", "f16"):
        dt = jnp.bfloat16 if fam == "bf16" else jnp.float16
        return a32.astype(dt), x32.astype(dt)
    if fam == "f8":
        k = devgen._key(seed, "sr", 0)
        ka, kx = jax.random.split(k)
        m, n = a32.shape
        a8 = sr_round_device_chunked(a32.reshape(-1), "f8e4m3", ka).reshape(m, n)
        return a8, sr_round_device_chunked(x32, "f8e4m3", kx)
    raise ValueError(fam)


def main():
    args = common.parse_args("gemv_benchmark", DEFAULT_SIZE, MIN_SIZE)
    common.enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from ..ops import df64 as dfm
    from ..ops import gemv as gemvops
    from ..ops import oracle
    from ..utils import devgen
    from ..utils.compare import relative_error

    seed = 42
    sizes = common.sweep_sizes(args, MIN_SIZE, ALIGN, dense_step=1024)
    max_n = max(sizes)
    variants = [v for v in VARIANTS if args.error or v[2] != "oracle"]
    names = [v[0] for v in variants]
    common.emit_header("rows", names)

    a32 = devgen.gen_f32((max_n, max_n), seed, "gemv_a")
    x32 = devgen.gen_f32((max_n,), seed, "gemv_x")
    r32 = devgen.gen_f32((max_n,), seed, "gemv_res")

    if args.error:
        a64 = devgen.master_f64((max_n, max_n), seed, "gemv_a")
        x64 = devgen.master_f64((max_n,), seed, "gemv_x")
        r64 = devgen.master_f64((max_n,), seed, "gemv_res")
        results = {n: {} for n in sizes}

        # jitted per variant (shared across sizes): eager dispatch through
        # the remote tunnel is ~30 ms/op
        def _jfn(kind, kw, fam):
            if kind == "fixed":
                return jax.jit(
                    lambda a, x, r: gemvops.gemv(
                        a, x, r.astype(a.dtype) if fam == "bf16" else r, ALPHA, BETA
                    )
                )
            if kind == "df":
                return jax.jit(
                    lambda a, x, r: gemvops.acc_gemv(a, x, r, ALPHA, BETA, ar="df64", **kw)
                )
            if kind == "acc32":
                return jax.jit(
                    lambda a, x, r: gemvops.acc_gemv(a, x, r, ALPHA, BETA, ar="f32")
                )
            if kind == "accbf16":
                return jax.jit(
                    lambda a, x, r: gemvops.acc_gemv(
                        a, x, r.astype(a.dtype), ALPHA, BETA, ar="bf16"
                    )
                )
            return jax.jit(lambda a, x, r: gemvops.xla_gemv(a, x, r, ALPHA, BETA))

        jfns = {nm: _jfn(kind, kw, f) for nm, f, kind, kw in variants if f != "oracle"}
        fams = sorted({v[1] for v in variants} - {"oracle"})
        for fam in fams:
            af, xf = _family_arrays(fam, a32, x32, seed)
            for nm, f, kind, kw in variants:
                if f != fam:
                    continue
                for n in sizes:
                    ref = ALPHA * (a64[:n, :n] @ x64[:n]) + BETA * r64[:n]

                    def eval_once(n=n, nm=nm, ref=ref):
                        out = _run_error(
                            lambda: jfns[nm](
                                _lead2(af, n), _lead2(xf, n), _lead2(r32, n)
                            )
                        )
                        return relative_error(
                            np.asarray(out.astype(jnp.float32), np.float64), ref
                        )

                    results[n][nm] = common.guarded(eval_once, f"{nm} n={n}")
                common.progress(f"{nm} error done")
            if fam != "f32":
                del af, xf
        if any(v[1] == "oracle" for v in variants):
            onm = next(v[0] for v in variants if v[1] == "oracle")
            del a32  # the split is the high-water mark; hi IS the f32 copy
            ah, al = devgen.split_df64(None, (max_n, max_n), seed, "gemv_a")
            xh, xl = devgen.split_df64(None, (max_n,), seed, "gemv_x")
            rh, rl = devgen.split_df64(None, (max_n,), seed, "gemv_res")
            for n in sizes:
                ref = ALPHA * (a64[:n, :n] @ x64[:n]) + BETA * r64[:n]

                def eval_oracle(n=n, ref=ref):
                    def run():
                        ax = oracle.gemv_df64(
                            _lead2(ah, n), _lead2(al, n), _lead2(xh, n), _lead2(xl, n)
                        )
                        return dfm.df_add(
                            dfm.df_mul_f32(ax, jnp.float32(ALPHA)),
                            dfm.df_mul_f32(dfm.DF(_lead2(rh, n), _lead2(rl, n)),
                                           jnp.float32(BETA)),
                        )
                    out = _run_error(run)
                    got = np.asarray(out.hi, np.float64) + np.asarray(out.lo, np.float64)
                    return relative_error(got, ref)

                results[n][onm] = common.guarded(eval_oracle, f"oracle n={n}")
                common.progress(f"oracle n={n} done")
        for n in sizes:
            common.emit_row(n, [results[n][nm] for nm in names])
        return

    # flops mode: chained loop timing, res as the carry AND a one-element
    # carry perturbation of x before every matvec. res alone is not enough:
    # the XLA-composed resident/f16 paths compute the matvec independently of
    # res, and XLA hoists it out of the timing loop (measured PFLOP/s
    # fiction); the x-perturbation pins the matvec itself. The x copy it
    # implies is O(n) against the O(n²) matrix stream — immaterial.
    results = {n: {} for n in sizes}
    fams = sorted({v[1] for v in variants})
    for fam in fams:
        af, xf = _family_arrays(fam, a32, x32, seed)
        for nm, f, kind, kw in variants:
            if f != fam:
                continue
            for n in sizes:
                a_, x_ = _lead2(af, n), _lead2(xf, n)
                r_ = _lead2(r32, n)
                if kind in ("fixed", "accbf16") and fam == "bf16":
                    r_ = r_.astype(jnp.bfloat16)

                def tier(a, x, r, kind=kind, kw=kw):
                    if kind == "xla":
                        return gemvops.xla_gemv(a, x, r, ALPHA, BETA)
                    if kind == "fixed":
                        return gemvops.gemv(a, x, r, ALPHA, BETA)
                    if kind == "accbf16":
                        return gemvops.acc_gemv(a, x, r, ALPHA, BETA, ar="bf16")
                    if kind == "df":
                        return gemvops.acc_gemv(a, x, r, ALPHA, BETA, ar="df64", **kw)
                    return gemvops.acc_gemv(a, x, r, ALPHA, BETA, ar="f32")

                def body(c, a_, x_, tier=tier):
                    xc = x_.at[0].add(
                        (c[0].astype(jnp.float32) * 1e-30).astype(x_.dtype)
                    )
                    return tier(a_, xc, c)

                results[n][nm] = common.guarded(
                    lambda: 2.0 * n * n / (benchmark_loop(body, r_, args=(a_, x_)) * 1e-3) / 1e9,
                    f"{nm} n={n}",
                )
                common.progress(f"{nm} n={n}: {results[n][nm]:.1f} GFLOP/s")
        if fam != "f32":
            del af, xf
    for n in sizes:
        common.emit_row(n, [results[n][nm] for nm in names])


def _run_error(fn):
    """One protocol-conformant untimed run (benchmark_function skip=True,
    reference ``cuda/utils.cuh:236-262``)."""
    box = {}

    def call():
        box["v"] = fn()
        return box["v"]

    benchmark_function(call, skip=True)
    return box["v"]


if __name__ == "__main__":
    main()
