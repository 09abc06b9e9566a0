"""Solver-tier benchmark — hardware evidence for ``models/solvers.py``.

The reference has no solvers (its "application" is the kernel drivers); this
driver measures what the accessor *buys at the application level*: CG on an
SPD system at every (storage × dot-arithmetic) pairing, reporting

- sustained iteration rate (it/s): narrow storage should approach its
  bandwidth advantage (the matvec dominates each iteration), and
- the achieved relative residual |b - A x| / |b| after a fixed iteration
  budget, evaluated with a device df64 residual (storage-exact oracle): df64
  dots must hold the recurrence at the f32-storage floor where plain-f32
  dots drift.

Timing: host-side wall clocks are untrustworthy through the remote tunnel
(even a D2H fetch measured ~zero delta between 20- and 120-iteration
solves), so CG calls are timed with the SAME chained in-device K-slope
harness as the kernels (`utils.bench.benchmark_loop` — the solution vector
feeds the next call's right-hand side, a true data chain), at two iteration
budgets; the per-iteration rate is the slope
(iters_hi - iters_lo) / (t_hi - t_lo), which cancels the per-call setup
(initial dots, tolerance computation) exactly.

CSV schema matches the kernel drivers (`;`-separated, 16 digits). Also rows
for richardson_refine (mixed-storage preconditioning) and power_method.
"""

from __future__ import annotations

import sys


import numpy as np

from . import common

ITERS_LO, ITERS_HI = 20, 120

DEFAULT_SIZE = 8192
MIN_SIZE = 512


def _spd_device(n: int, seed: int):
    """Moderately ill-conditioned SPD system, generated on device (no tunnel
    bulk transfer): A = C^T C / n + 0.01 I (Wishart + ridge, kappa ~ 400) —
    hard enough that a 120-iteration CG budget is actually SPENT (a
    diagonally-dominant I + U/2n system converges in ~10 iterations, which
    made every iteration budget measure the same work)."""
    import jax
    import jax.numpy as jnp

    ku, kb = jax.random.split(jax.random.PRNGKey(seed))
    c = jax.random.uniform(ku, (n, n), jnp.float32, -1.0, 1.0)
    with jax.default_matmul_precision("highest"):
        w = jnp.matmul(c.T, c) / n
    a = w + 0.01 * jnp.eye(n, dtype=jnp.float32)
    b = jax.random.uniform(kb, (n,), jnp.float32, -1.0, 1.0)
    return a, b


def _df64_residual(a32, b, x):
    """Device df64 relative residual |b - A x| / |b| against the f32-stored
    operator (the storage-exact oracle for the solver's own system)."""
    import jax
    import jax.numpy as jnp

    from ..ops import gemv as gemvops

    # jitted: eager composite dispatch through the remote tunnel costs
    # ~25-30 ms per op (CLAUDE.md), and the precise df64 GEMV is many ops
    ax = jax.jit(
        lambda a_, x_: gemvops.acc_gemv(
            a_, x_, jnp.zeros((a_.shape[0],), jnp.float32), 1.0, 0.0,
            ar="df64", precise=True,
        )
    )(a32, x)
    r = np.asarray(b, np.float64) - np.asarray(ax, np.float64)
    return float(np.linalg.norm(r) / np.linalg.norm(np.asarray(b, np.float64)))


def _pcg_table(n: int, iters: int):
    """Mesh-sharded CG convergence per (storage x dot-arithmetic) tier,
    next to the single-chip CG on the same system — the `solvers.csv`
    companion for the `parallel` layer (round-3 VERDICT #9). The value is
    CONVERGENCE parity (the sharded recurrence with psum/DF-combined dots
    must track the single-chip one), not throughput, so it runs on whatever
    mesh the backend offers — the 8-device CPU mesh in validation, real
    chips when available. Emits resid pairs (pcg, single-chip cg)."""
    import functools

    import jax
    import jax.numpy as jnp

    from ..models import solvers
    from ..parallel import make_mesh, pcg

    mesh = make_mesh(len(jax.devices()))
    a32, b = _spd_device(n, seed=42)
    ab = a32.astype(jnp.bfloat16)
    variants = [
        ("f32/f32", a32, "f32"),
        ("f32/df64", a32, "df64"),
        ("bf16/f32", ab, "f32"),
        ("bf16/df64", ab, "df64"),
    ]
    # one CSV row PER VARIANT, flushed as soon as it is measured: the
    # round-4 capture died after 1 of 4 variants and the then
    # buffer-to-the-end emitter lost everything (the exact failure mode the
    # reference's DOT driver has, ``cuda/dot_benchmark.cu:177-189`` — and
    # the one the repo's checkpoint/resume story exists to avoid)
    print(common.DELIM.join(["n", "variant", "pcg resid", "cg resid"]),
          flush=True)
    common.progress(f"pcg mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")
    for nm, a, ar in variants:
        def one(nm=nm, a=a, ar=ar):
            xp, rsp, itp = jax.jit(
                functools.partial(pcg, mesh=mesh, iters=iters, ar=ar, tol=0.0)
            )(a, b)
            xs, rss, its = jax.jit(
                functools.partial(solvers.cg, iters=iters, ar=ar, tol=0.0)
            )(a, b)
            rp = _df64_residual(a32, b, xp)
            rs = _df64_residual(a32, b, xs)
            common.progress(
                f"pcg {nm}: resid {rp:.3e} (single-chip {rs:.3e}) after "
                f"{int(itp)}/{int(its)} iters"
            )
            return rp, rs

        try:
            rp, rs = one()
        except Exception as e:  # noqa: BLE001 - per-variant fault isolation
            common.progress(f"FAILED pcg {nm}: {type(e).__name__}: {str(e)[:200]}")
            rp, rs = float("nan"), float("nan")
        print(common.DELIM.join([str(n), nm, common.fmt(rp), common.fmt(rs)]),
              flush=True)


def main():
    common.enable_compile_cache()
    import functools

    import jax
    import jax.numpy as jnp

    from ..models import solvers

    def extra(p):
        p.add_argument("--pcg", action="store_true",
                       help="mesh-sharded CG convergence table (pcg vs "
                       "single-chip cg per tier) instead of the it/s table")
        p.add_argument("--iters", type=int, default=ITERS_HI,
                       help="fixed iteration budget for --pcg")

    args = common.parse_args("solvers_benchmark", DEFAULT_SIZE, MIN_SIZE,
                             extra=extra)
    if args.pcg:
        _pcg_table(args.size, args.iters)
        return

    # size sweep (round-4 VERDICT #6: the application-level accessor claims
    # — df64 dot cost, bf16 iteration speedup, residual floors — should be
    # curves, not one point); rows emit per size, kill-safe
    sizes = common.sweep_sizes(args, MIN_SIZE, 256, dense_step=2048)
    names = ["CG f32/f32", "CG f32/df64", "CG bf16/f32", "CG bf16/df64"]
    common.emit_header("n", [f"{name} {col}" for name in names
                             for col in ("it_per_s", "resid")])

    from ..utils.bench import benchmark_loop

    for n in sizes:
        a32, b = _spd_device(n, seed=42)
        ab = a32.astype(jnp.bfloat16)
        jax.block_until_ready((a32, ab, b))
        variants = [
            (names[0], a32, "f32"),
            (names[1], a32, "df64"),
            (names[2], ab, "f32"),
            (names[3], ab, "df64"),
        ]

        vals = []
        for name, a, ar in variants:
            def cg_ms(iters, a=a, ar=ar):
                """Per-call ms for a full `iters`-iteration CG solve, via the
                chained in-device loop (x_out -> clipped next rhs)."""
                import jax.numpy as jnp

                def body(c, a):
                    x, rs, it = solvers.cg(a, jnp.clip(c, -1.0, 1.0),
                                           iters=iters, ar=ar, tol=0.0)
                    return x

                return benchmark_loop(body, b, args=(a,))

            def measure(name=name, a=a, ar=ar):
                out_hi = jax.jit(
                    functools.partial(solvers.cg, iters=ITERS_HI, ar=ar, tol=0.0)
                )(a, b)
                t_lo = cg_ms(ITERS_LO)
                t_hi = cg_ms(ITERS_HI)
                # a non-positive slope means the two budgets did the same
                # device work — report NaN, not a fiction (a pegged guard
                # value once slipped into solvers.csv looking like a
                # plausible rate)
                if t_hi > t_lo:
                    rate = (ITERS_HI - ITERS_LO) / (t_hi - t_lo) * 1e3
                else:
                    rate = float("nan")
                resid = _df64_residual(a32, b, out_hi[0])
                common.progress(
                    f"n={n} {name}: {rate:.1f} it/s ({t_lo:.2f}/{t_hi:.2f} ms "
                    f"at {ITERS_LO}/{ITERS_HI} iters), resid {resid:.3e}"
                )
                return rate, resid

            try:
                rate, resid = measure()
            except Exception as e:  # noqa: BLE001 - per-variant fault isolation
                common.progress(f"FAILED n={n} {name}: {type(e).__name__}: {str(e)[:200]}")
                rate, resid = float("nan"), float("nan")
            vals.extend([rate, resid])
        common.emit_row(n, vals)

    # the two other solver demos: one line each on stderr (their value is the
    # convergence property, asserted in tests; here just hardware liveness +
    # rates at the endpoint size)
    x, rhist = jax.jit(
        functools.partial(solvers.richardson_refine, iters=6, ar="df64")
    )(ab, a32, b)
    jax.block_until_ready((x, rhist))
    common.progress(
        f"richardson bf16-precond/f32-residual: |r|^2 {float(rhist[-1]):.3e} after 6 iters"
    )
    xv, lam = jax.jit(functools.partial(solvers.power_method, iters=15, ar="f32"))(a32)
    jax.block_until_ready((xv, lam))
    common.progress(f"power_method lambda_max ~= {float(lam):.6f}")


if __name__ == "__main__":
    main()
