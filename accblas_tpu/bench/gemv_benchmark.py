"""GEMV benchmark driver — the ``gemv_benchmark`` executable analogue
(reference ``cuda/gemv_benchmark.cu``).

Square sweep over submatrix views of one max_size allocation (the reference's
stride trick, ``cuda/gemv_benchmark.cu:211-215``); alpha = beta = 1
(``cuda/gemv_benchmark.cu:25-28``); flops mode reports GFLOP/s (2·n²), error
mode the 1-norm relative error vs the numpy fp64 oracle on master data
(``cuda/gemv_benchmark.cu:219-231``), with the result buffer re-zeroed between
runs because beta != 0 (``cuda/gemv_benchmark.cu:76,108-111``).
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
ALPHA, BETA = 1.0, 1.0


def main():
    args = common.parse_args("gemv_benchmark", DEFAULT_SIZE, MIN_SIZE)
    common.enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from ..ops import gemv as gemvops

    sizes = common.sweep_sizes(args, MIN_SIZE, ALIGN, dense_step=ALIGN)
    max_n = max(sizes)

    a64 = gen_mtx(MatrixInfo(max_n, max_n), seed=42)
    x64 = gen_mtx(MatrixInfo(1, max_n), seed=43)[0]
    r64 = gen_mtx(MatrixInfo(1, max_n), seed=44)[0]
    a32_full = jax.device_put(a64.astype(np.float32))
    x32_full = jax.device_put(x64.astype(np.float32))
    r32_full = jax.device_put(r64.astype(np.float32))
    ab_full = a32_full.astype(jnp.bfloat16)
    xb_full = x32_full.astype(jnp.bfloat16)

    run_f32 = jax.jit(lambda a, x, r: gemvops.gemv(a, x, r, ALPHA, BETA))
    run_bf16 = jax.jit(lambda a, x, r: gemvops.gemv(a, x, r, ALPHA, BETA))
    run_acc_df = jax.jit(
        lambda a, x, r: gemvops.acc_gemv(a, x, r, ALPHA, BETA, ar="df64")
    )
    run_acc_f32b = jax.jit(lambda a, x, r: gemvops.acc_gemv(a, x, r, ALPHA, BETA, ar="f32"))
    run_acc_dfb = jax.jit(
        lambda a, x, r: gemvops.acc_gemv(a, x, r, ALPHA, BETA, ar="df64")
    )
    run_xla_f32 = jax.jit(lambda a, x, r: gemvops.xla_gemv(a, x, r, ALPHA, BETA))
    run_xla_bf16 = jax.jit(lambda a, x, r: gemvops.xla_gemv(a, x, r, ALPHA, BETA))

    names = [
        "GEMV fp32",
        "GEMV bf16",
        "GEMV Acc<df64,f32>",
        "GEMV Acc<f32,bf16>",
        "GEMV Acc<df64,bf16>",
        "XLA GEMV fp32",
        "XLA GEMV bf16",
    ]
    common.emit_header("rows", names)

    for n in sizes:
        a32 = a32_full[:n, :n]
        x32 = x32_full[:n]
        r32 = r32_full[:n]
        ab = ab_full[:n, :n]
        xb = xb_full[:n]
        rbf = r32  # res stays f32 even for bf16 storage inputs (wider result)

        entries = [
            (run_f32, (a32, x32, r32), False),
            (run_bf16, (ab, xb, r32.astype(jnp.bfloat16)), False),
            (run_acc_df, (a32, x32, r32), False),
            (run_acc_f32b, (ab, xb, rbf), False),
            (run_acc_dfb, (ab, xb, rbf), False),
            (run_xla_f32, (a32, x32, r32), True),
            (run_xla_bf16, (ab, xb, rbf), True),
        ]

        if args.error:
            ref = ALPHA * (a64[:n, :n] @ x64[:n]) + BETA * r64[:n]
            vals = [
                relative_error(np.asarray(fn(*ops_).astype(jnp.float32)), ref)
                for fn, ops_, _ in entries
            ]
        else:
            # chained loop timing: res is the carry. For the Pallas tiers the
            # kernel consumes res; the XLA tier's matvec ignores res values,
            # so its x operand additionally gets a one-element carry
            # perturbation (an n-sized copy per iteration — negligible
            # against the n^2 matrix stream) to prevent hoisting.
            vals = []
            for fn, ops_, is_xla in entries:
                a_, x_, r_ = ops_
                if is_xla:
                    def body(c, a_, x_, fn=fn):
                        xc = x_.at[0].add((c[0] * 1e-30).astype(x_.dtype))
                        return fn(a_, xc, c)
                else:
                    body = lambda c, a_, x_, fn=fn: fn(a_, x_, c)
                ms = benchmark_loop(body, r_, args=(a_, x_))
                vals.append(2.0 * n * n / (ms * 1e-3) / 1e9)
        common.emit_row(n, vals)


if __name__ == "__main__":
    main()
