"""TRSV benchmark driver — the ``trsv_benchmark`` executable analogue
(reference ``cuda/trsv_benchmark.cu``).

The master matrix is LU-factorized once at max size in fp64 on the host
(scipy getrf — the cuSOLVER ``cusolverDnDgetrf`` role,
``cuda/trsv_memory.cuh:150-163``) so its triangles are realistic factors;
the sweep solves on leading submatrix views. Upper triangle, unit diagonal —
the reference's hardcoded benchmark mode (``cuda/trsv_benchmark.cu:26-27``).
FLOP count n² (the triangle's 2·(n²/2) multiply-adds); error mode is the
1-norm relative error vs a scipy fp64 solve of the same triangle.
"""

from __future__ import annotations

import numpy as np

from . import common
from ..utils import MatrixInfo, gen_mtx
from ..utils.bench import benchmark_loop
from ..utils.compare import relative_error

MIN_SIZE = 1024
DEFAULT_SIZE = 16384
ALIGN = 1024
UPLO, UNIT = "upper", True  # reference: tmtx_t::upper, dmtx_t::unit


def main():
    def extra(p):
        p.add_argument("--uplo", choices=["upper", "lower"], default=UPLO)
        p.add_argument("--no-unit", dest="unit", action="store_false", default=UNIT,
                       help="non-unit diagonal (the reference hardcodes unit; "
                       "unit-upper on an LU factor is exponentially ill-conditioned, "
                       "so error studies should pass --no-unit)")

    args = common.parse_args("trsv_benchmark", DEFAULT_SIZE, MIN_SIZE, extra=extra)
    uplo, unit = args.uplo, args.unit
    common.enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import scipy.linalg

    from ..ops import trsv as trsvops

    sizes = common.sweep_sizes(args, MIN_SIZE, ALIGN, dense_step=ALIGN)
    max_n = max(sizes)

    a64 = gen_mtx(MatrixInfo(max_n, max_n), seed=42)
    lu64, _ = scipy.linalg.lu_factor(a64)
    b64 = gen_mtx(MatrixInfo(1, max_n), seed=43)[0]
    a32_full = jax.device_put(lu64.astype(np.float32))
    b32_full = jax.device_put(b64.astype(np.float32))
    ab_full = a32_full.astype(jnp.bfloat16)

    run_f32 = jax.jit(lambda a, b: trsvops.trsv(a, b, uplo, unit))
    run_acc_f32 = jax.jit(lambda a, b: trsvops.acc_trsv(a, b, uplo, unit, ar="f32"))
    run_acc_f32b = jax.jit(lambda a, b: trsvops.acc_trsv(a, b, uplo, unit, ar="f32"))
    run_acc_df = jax.jit(lambda a, b: trsvops.acc_trsv(a, b, uplo, unit, ar="df64"))
    run_xla = jax.jit(lambda a, b: trsvops.xla_trsv(a, b, uplo, unit))

    names = [
        "TRSV fp32",
        "TRSV Acc<f32,f32>",
        "TRSV Acc<f32,bf16>",
        "TRSV Acc<df64,f32>",
        "XLA TRSV fp32",
    ]
    common.emit_header("n", names)

    for n in sizes:
        a32 = a32_full[:n, :n]
        b32 = b32_full[:n]
        ab = ab_full[:n, :n]

        entries = [
            (run_f32, (a32, b32)),
            (run_acc_f32, (a32, b32)),
            (run_acc_f32b, (ab, b32)),
            (run_acc_df, (a32, b32)),
            (run_xla, (a32, b32)),
        ]

        if args.error:
            t = np.triu(lu64[:n, :n]) if uplo == "upper" else np.tril(lu64[:n, :n])
            if unit:
                np.fill_diagonal(t, 1.0)
            ref = scipy.linalg.solve_triangular(t, b64[:n], lower=(uplo == "lower"))
            vals = [
                relative_error(np.asarray(fn(*ops_), np.float64), ref)
                for fn, ops_ in entries
            ]
        else:
            # chained loop timing: the previous solution (clipped, so repeated
            # ill-conditioned solves stay bounded) becomes the next rhs — a
            # true data dependence; optimization_barrier tuples proved
            # unreliable for pinning loop-invariant work on this toolchain
            vals = []
            for fn, ops_ in entries:
                a_, b_ = ops_

                def body(c, a_, b_, fn=fn):
                    return fn(a_, jnp.clip(c, -1.0, 1.0).astype(b_.dtype))

                ms = benchmark_loop(body, b_, args=(a_, b_))
                vals.append(n * n / (ms * 1e-3) / 1e9)  # GFLOP/s (n^2 flops)
        common.emit_row(n, vals)


if __name__ == "__main__":
    main()
