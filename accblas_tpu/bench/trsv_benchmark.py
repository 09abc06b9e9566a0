"""TRSV/TRSM benchmark driver — the ``trsv_benchmark`` executable analogue
(reference ``cuda/trsv_benchmark.cu``).

The master matrix is LU-factorized once at max size in fp64 on the host
(scipy getrf — the cuSOLVER ``cusolverDnDgetrf`` role,
``cuda/trsv_memory.cuh:150-163``) so its triangles are realistic factors;
the sweep solves on leading submatrix views. Upper triangle, unit diagonal —
the reference's hardcoded benchmark mode (``cuda/trsv_benchmark.cu:26-27``).
FLOP count n² (the triangle's 2·(n²/2) multiply-adds); error mode is the
1-norm relative error vs a scipy fp64 solve of the same triangle, each
variant executed once via ``benchmark_function(..., skip=True)``
(``cuda/utils.cuh:236-262``), plus the df64-refinement device oracle column
(the cuBLAS fp64 cross-check analogue, ``cuda/utils.cuh:315-332``).

``--nrhs K`` switches to TRSM columns (T X = B with B of shape (n, K)) — the
multi-RHS generalization the reference lacks; FLOP count n²·K.

Unlike DOT/GEMV this driver keeps host generation + H→D transfer: the LU
factorization happens on the host, so the factored values cannot be replayed
from a PRNG stream on device.
"""

from __future__ import annotations

import sys

import numpy as np

from . import common
from ..utils import MatrixInfo, gen_mtx
from ..utils.bench import benchmark_function, benchmark_loop
from ..utils.compare import relative_error

MIN_SIZE = 128  # round 3: cover the resident regime (reference sweeps from n=100)
DEFAULT_SIZE = 16384
ALIGN = 128
UPLO, UNIT = "upper", True  # reference: tmtx_t::upper, dmtx_t::unit


def _lu_cached(max_n: int, seed: int, scipy):
    """LU-factorized master matrix, disk-cached: getrf at the 24576 endpoint
    costs ~an hour on this host's single core, and the flops and error
    invocations of the driver need the identical factor (the reference
    factorizes once per process, ``cuda/trsv_memory.cuh:150-163``; caching
    across processes is the moral equivalent for a sweep campaign)."""
    import os

    cache_dir = os.environ.get(
        "ACCBLAS_CACHE", os.path.expanduser("~/.cache/accblas_jit")
    )
    path = os.path.join(cache_dir, f"lu64_seed{seed}_n{max_n}.npy")
    if os.path.exists(path):
        return np.load(path)
    a64 = gen_mtx(MatrixInfo(max_n, max_n), seed=seed)
    lu64, _ = scipy.linalg.lu_factor(a64)
    del a64
    try:
        os.makedirs(cache_dir, exist_ok=True)
        np.save(path, lu64)
    except OSError:
        pass
    return lu64


def _run_error(fn):
    """One protocol-conformant untimed run (benchmark_function skip=True)."""
    box = {}

    def call():
        box["v"] = fn()
        return box["v"]

    benchmark_function(call, skip=True)
    return box["v"]


def main():
    def extra(p):
        p.add_argument("--uplo", choices=["upper", "lower"], default=UPLO)
        p.add_argument("--no-unit", dest="unit", action="store_false", default=UNIT,
                       help="non-unit diagonal (the reference hardcodes unit; "
                       "unit-upper on an LU factor is exponentially ill-conditioned, "
                       "so error studies should pass --no-unit)")
        p.add_argument("--nrhs", type=int, default=0,
                       help="benchmark TRSM with this many right-hand sides "
                       "(0 = TRSV)")
        p.add_argument("--only", default=None,
                       help="flops mode: capture only columns whose name "
                       "contains this substring (targeted recaptures after "
                       "a routing change; redirect to a dedicated CSV — the "
                       "schema shrinks to the matching columns)")

    args = common.parse_args("trsv_benchmark", DEFAULT_SIZE, MIN_SIZE, extra=extra)
    uplo, unit, nrhs = args.uplo, args.unit, args.nrhs
    common.enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import scipy.linalg

    from ..ops import oracle
    from ..ops import trsv as trsvops

    sizes = common.sweep_sizes(args, MIN_SIZE, ALIGN, dense_step=1024)
    max_n = max(sizes)

    lu64 = _lu_cached(max_n, 42, scipy)
    b64 = gen_mtx(MatrixInfo(max_n, nrhs) if nrhs else MatrixInfo(1, max_n), seed=43)
    if not nrhs:
        b64 = b64[0]
    a32_full = jax.device_put(lu64.astype(np.float32))
    b32_full = jax.device_put(b64.astype(np.float32))
    ab_full = a32_full.astype(jnp.bfloat16)
    ah_full = a32_full.astype(jnp.float16)
    af8_full = a32_full.astype(jnp.float8_e4m3fn)

    op = "TRSM" if nrhs else "TRSV"
    solve = trsvops.trsm if nrhs else trsvops.trsv
    acc_solve = trsvops.acc_trsm if nrhs else trsvops.acc_trsv
    xla_solve = trsvops.xla_trsm if nrhs else trsvops.xla_trsv
    flops_per_n = (lambda n: n * n * nrhs) if nrhs else (lambda n: n * n)

    run_f32 = jax.jit(lambda a, b: solve(a, b, uplo, unit))
    run_acc_f32 = jax.jit(lambda a, b: acc_solve(a, b, uplo, unit, ar="f32"))
    # the bf16 column is a throughput/storage demonstration (documented in
    # BENCH_NOTES; its error column shows the recurrence blow-up) — opt in
    run_acc_f32b = jax.jit(
        lambda a, b: acc_solve(a, b, uplo, unit, ar="f32", unstable_ok=True)
    )
    # f16 storage (10-bit mantissa) sits between bf16 and f32 on the
    # error lattice and, since the blocked-XLA routing, runs at narrow
    # storage speed too (683 GF/s at 24576 single-rhs, probe_r3j)
    run_acc_f16 = jax.jit(
        lambda a, b: acc_solve(a, b, uplo, unit, ar="f32", unstable_ok=True)
    )
    # f8e4m3 storage: throughput-only column (flops mode). Its error column
    # is deliberately out of the benched matrix: the 3-bit mantissa's
    # storage-truncation error reaches O(1) on LU-factor triangles even
    # below the bf16 envelope (the bf16 column already demonstrates the
    # narrow-storage blow-up class in trsv_error.csv — 0.95 at 24576), so
    # an f8 error row would only restate it louder. Single-rhs f8 rides
    # the blocked-XLA schedule since round 5 (probe_r5k: 973 GF/s at
    # 24576 vs the Pallas sweep's 121; see ops/trsv.py _use_small).
    run_acc_f8 = jax.jit(
        lambda a, b: acc_solve(a, b, uplo, unit, ar="f32", unstable_ok=True)
    )
    run_acc_df = jax.jit(lambda a, b: acc_solve(a, b, uplo, unit, ar="df64"))
    run_xla = jax.jit(lambda a, b: xla_solve(a, b, uplo, unit))

    # cold columns re-do the whole solve INCLUDING phase-1 leaf inversion
    # every iteration (matrix carried through the loop with a data-dependent
    # in-place perturbation, so XLA cannot hoist the inversion) — the
    # reference's protocol, which Gauss–Jordan-inverts the diagonal blocks
    # inside the kernel on every launch (``cuda/trsv_kernels.cuh:125-162``).
    # The warm columns amortize inversion over repeated solves (the loop
    # hoists it), the realistic production pattern. Flops mode only.
    names = [
        f"{op} fp32",
        f"{op} fp32 cold",
        f"{op} Acc<f32,f32>",
        f"{op} Acc<f32,bf16>",
        f"{op} Acc<f32,f16>",
        f"{op} Acc<f32,f8e4m3>",
        f"{op} Acc<df64,f32>",
        f"{op} Acc<df64,f32> cold",
        f"XLA {op} fp32",
    ]
    if args.error:
        if args.only:
            raise SystemExit("--only is flops-mode only")
        names = [nm for nm in names
                 if not (nm.endswith(" cold") or "f8e4m3" in nm)]
        if not nrhs:
            names.append(f"{op} df64 oracle (device)")
    only_sel = None
    if args.only:
        only_sel = [i for i, nm in enumerate(names)
                    if args.only.lower() in nm.lower()]
        if not only_sel:
            raise SystemExit(f"--only {args.only!r} matches no column")
        names = [names[i] for i in only_sel]
    common.emit_header("n", names)

    if args.error and not nrhs:
        # split of the solved triangle itself (masked, unit diag materialized)
        # for the refinement oracle — see ops.oracle.trsv_df64
        t64 = np.triu(lu64[:max_n, :max_n]) if uplo == "upper" else np.tril(lu64)
        if unit:
            np.fill_diagonal(t64, 1.0)
        th_full = jax.device_put(t64.astype(np.float32))
        tl_full = jax.device_put((t64 - np.asarray(th_full, np.float64)).astype(np.float32))
        bh_full = b32_full
        bl_full = jax.device_put((b64 - np.asarray(b32_full, np.float64)).astype(np.float32))

    for n in sizes:
        a32 = a32_full[:n, :n]
        b32 = b32_full[:n]
        ab = ab_full[:n, :n]
        ah = ah_full[:n, :n]
        af8 = af8_full[:n, :n]

        # entry tuples: (fn, operands, cold, f8)
        entries = [
            (run_f32, (a32, b32), False, False),
            (run_f32, (a32, b32), True, False),
            (run_acc_f32, (a32, b32), False, False),
            (run_acc_f32b, (ab, b32), False, False),
            (run_acc_f16, (ah, b32), False, False),
            (run_acc_f8, (af8, b32), False, True),
            (run_acc_df, (a32, b32), False, False),
            (run_acc_df, (a32, b32), True, False),
            (run_xla, (a32, b32), False, False),
        ]
        if args.error:
            entries = [e for e in entries if not (e[2] or e[3])]
        if only_sel is not None:
            entries = [entries[i] for i in only_sel]

        if args.error:
            t = np.triu(lu64[:n, :n]) if uplo == "upper" else np.tril(lu64[:n, :n])
            if unit:
                np.fill_diagonal(t, 1.0)
            ref = scipy.linalg.solve_triangular(
                t, b64[:n], lower=(uplo == "lower"), unit_diagonal=unit
            )
            vals = [
                common.guarded(
                    lambda f=fn, o=ops_: relative_error(
                        np.asarray(_run_error(lambda: f(*o)), np.float64), ref
                    ),
                    f"entry n={n}",
                )
                for fn, ops_, *_ in entries
            ]
            if not nrhs:
                def eval_oracle():
                    x = _run_error(
                        lambda: oracle.trsv_df64(
                            th_full[:n, :n], tl_full[:n, :n], bh_full[:n],
                            bl_full[:n], uplo, unit,
                        )
                    )
                    got = np.asarray(x.hi, np.float64) + np.asarray(x.lo, np.float64)
                    return relative_error(got, ref)

                vals.append(common.guarded(eval_oracle, f"oracle n={n}"))
        else:
            # chained loop timing: the previous solution (clipped, so repeated
            # ill-conditioned solves stay bounded) becomes the next rhs — a
            # true data dependence; optimization_barrier tuples proved
            # unreliable for pinning loop-invariant work on this toolchain
            vals = []
            for fn, ops_, cold, _f8 in entries:
                a_, b_ = ops_

                if cold:
                    # the matrix rides the carry with a data-dependent
                    # in-place perturbation of one element — the leaf
                    # inversion reads it, so XLA must redo phase 1 every
                    # iteration (the .at add aliases in place: O(1)/iter)
                    def body(c, b_, fn=fn):
                        xprev, ac = c
                        bump = (xprev[(0,) * xprev.ndim] * 1e-30).astype(ac.dtype)
                        ac = ac.at[0, 0].add(bump)
                        x = fn(ac, jnp.clip(xprev, -1.0, 1.0).astype(b_.dtype))
                        return (x, ac)

                    carry0, largs = (b_, a_), (b_,)
                else:
                    def body(c, a_, b_, fn=fn):
                        return fn(a_, jnp.clip(c, -1.0, 1.0).astype(b_.dtype))

                    carry0, largs = b_, (a_, b_)

                vals.append(common.guarded(
                    lambda: flops_per_n(n) / (benchmark_loop(body, carry0, args=largs) * 1e-3) / 1e9,
                    f"entry n={n}",
                ))
        common.emit_row(n, vals)
        print(f"# trsv n={n} done", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
