"""DOT benchmark driver — the ``dot_benchmark`` executable analogue
(reference ``cuda/dot_benchmark.cu``).

Variants (CSV columns; reference set at ``cuda/dot_benchmark.cu:95-142``,
remapped to the TPU dtype lattice — fp64 arithmetic → df64, fp32 storage
under wider arithmetic → bf16 storage under f32, see SURVEY.md §7):

  DOT fp32            — fixed precision, hand-written Pallas
  DOT bf16            — fixed precision (the cheap/inaccurate end)
  DOT Acc<df64,f32>   — accessor, fp64-class arithmetic over f32 storage
  DOT Acc<f32,bf16>   — accessor, f32 arithmetic over bf16 storage (headline)
  DOT Acc<df64,bf16>  — accessor, widest gap
  XLA DOT fp32/bf16   — vendor tier (cuBLAS analogue)

Protocol (BASELINE.md): warmup + 10 reps, min; error mode reports the median
relative error over 10 re-randomizations vs the numpy fp64 master-data dot
(reference ``cuda/dot_benchmark.cu:162-164,175,238-259``); seed 42,
uniform(-1,1), subnormal-filtered.
"""

from __future__ import annotations

import functools

import numpy as np

from . import common
from ..utils import MatrixInfo, gen_mtx
from ..utils.bench import benchmark_function

MIN_SIZE = 2**20  # ~1e6, reference start (cuda/dot_benchmark.cu:26)
DEFAULT_SIZE = 2**27  # 1.3e8 f64 master + copies fits comfortably in 16 GB HBM
ALIGN = 2**13


def _make_benchmarks(jit, jnp, dotops, dfm, x32, y32, xb, yb, oracle):
    def err_of(val):
        return abs(val - oracle()) / abs(oracle())

    run_f32 = jit(lambda a, b: dotops.dot(a, b))
    run_bf16 = jit(lambda a, b: dotops.dot(a, b))
    run_acc_df_f32 = jit(lambda a, b: dotops.acc_dot(a, b, ar="df64", precise=True))
    run_acc_f32_bf16 = jit(lambda a, b: dotops.acc_dot(a, b, ar="f32"))
    run_acc_df_bf16 = jit(lambda a, b: dotops.acc_dot(a, b, ar="df64", precise=True))
    run_xla_f32 = jit(lambda a, b: dotops.xla_dot(a, b))
    run_xla_bf16 = jit(lambda a, b: dotops.xla_dot(a, b))

    return [
        common.BenchmarkInfo(
            "DOT fp32",
            lambda: run_f32(x32(), y32()),
            lambda: err_of(float(run_f32(x32(), y32()))),
        ),
        common.BenchmarkInfo(
            "DOT bf16",
            lambda: run_bf16(xb(), yb()),
            lambda: err_of(float(run_bf16(xb(), yb()).astype(jnp.float32))),
        ),
        common.BenchmarkInfo(
            "DOT Acc<df64,f32>",
            lambda: run_acc_df_f32(x32(), y32()),
            lambda: err_of(float(dfm.df_to_f64(run_acc_df_f32(x32(), y32())))),
        ),
        common.BenchmarkInfo(
            "DOT Acc<f32,bf16>",
            lambda: run_acc_f32_bf16(xb(), yb()),
            lambda: err_of(float(run_acc_f32_bf16(xb(), yb()))),
        ),
        common.BenchmarkInfo(
            "DOT Acc<df64,bf16>",
            lambda: run_acc_df_bf16(xb(), yb()),
            lambda: err_of(float(dfm.df_to_f64(run_acc_df_bf16(xb(), yb())))),
        ),
        common.BenchmarkInfo(
            "XLA DOT fp32",
            lambda: run_xla_f32(x32(), y32()),
            lambda: err_of(float(run_xla_f32(x32(), y32()))),
        ),
        common.BenchmarkInfo(
            "XLA DOT bf16",
            lambda: run_xla_bf16(xb(), yb()),
            lambda: err_of(float(run_xla_bf16(xb(), yb()).astype(jnp.float32))),
        ),
    ]


def main():
    args = common.parse_args("dot_benchmark", DEFAULT_SIZE, MIN_SIZE)
    common.enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from ..ops import dot as dotops
    from ..ops import df64 as dfm

    max_n = common.sweep_sizes(args, MIN_SIZE, ALIGN, 0)[-1] if args.sweep != "dense" else args.size
    sizes = common.sweep_sizes(args, MIN_SIZE, ALIGN, dense_step=2 * 10**6)

    # master data: fp64 on host (seed 42, uniform(-1,1), subnormal-filtered,
    # reference cuda/dot_benchmark.cu:71-76); device copies in each storage
    x64 = gen_mtx(MatrixInfo(1, max(sizes)), seed=42)[0]
    y64 = gen_mtx(MatrixInfo(1, max(sizes)), seed=43)[0]
    x32_full = jax.device_put(x64.astype(np.float32))
    y32_full = jax.device_put(y64.astype(np.float32))
    xb_full = x32_full.astype(jnp.bfloat16)
    yb_full = y32_full.astype(jnp.bfloat16)

    names = None
    rows = []
    for n in sizes:
        x32v, y32v = x32_full[:n], y32_full[:n]
        xbv, ybv = xb_full[:n], yb_full[:n]
        state = {"oracle": None}

        def oracle():
            if state["oracle"] is None:
                state["oracle"] = x64[:n] @ y64[:n]
            return state["oracle"]

        benches = _make_benchmarks(
            jax.jit,
            jnp,
            dotops,
            dfm,
            lambda: x32v,
            lambda: y32v,
            lambda: xbv,
            lambda: ybv,
            oracle,
        )
        if names is None:
            names = [b.name for b in benches]
            common.emit_header("n", names)

        if args.error:
            # median over re-randomizations (reference: 10)
            errs = {b.name: [] for b in benches}
            for r in range(args.randomizations):
                if r > 0:
                    xr = gen_mtx(MatrixInfo(1, n), seed=1000 + r)[0]
                    yr = gen_mtx(MatrixInfo(1, n), seed=2000 + r)[0]
                    x64[:n], y64[:n] = xr, yr
                    x32v = jax.device_put(xr.astype(np.float32))
                    y32v = jax.device_put(yr.astype(np.float32))
                    xbv = x32v.astype(jnp.bfloat16)
                    ybv = y32v.astype(jnp.bfloat16)
                    state["oracle"] = None
                    benches = _make_benchmarks(
                        jax.jit, jnp, dotops, dfm,
                        functools.partial(lambda v: v, x32v),
                        functools.partial(lambda v: v, y32v),
                        functools.partial(lambda v: v, xbv),
                        functools.partial(lambda v: v, ybv),
                        oracle,
                    )
                for b in benches:
                    errs[b.name].append(b.error())
            rows.append((n, [common.median(errs[nm]) for nm in names]))
            common.emit_row(n, rows[-1][1])
        else:
            vals = []
            for b in benches:
                ms = benchmark_function(b.run)
                vals.append(2.0 * n / (ms * 1e-3) / 1e9)  # GFLOP/s
            common.emit_row(n, vals)

    return rows


if __name__ == "__main__":
    main()
