"""Probe: why does the chained CG harness measure ~11 iterations of work
regardless of the 20/120 budget on TPU? (round-3 solvers.csv shows it/s
pegged at the 1e14 guard for 3 of 4 variants, and even the f32/f32 number
implies 34 ns/iteration — fiction.)

Checks, in order:
1. standalone jitted cg: does `it` reach the budget? is rs/x NaN?
2. the exact chained sequence (rhs = clip(x_prev)): it/rs/NaN per call
3. wall time of budget-20 vs budget-120 standalone calls (benchmark_function)
4. benchmark_loop slope for both budgets (the driver's own protocol)
"""
import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from accblas_tpu.models import solvers
from accblas_tpu.utils.bench import benchmark_function, benchmark_loop

print("devices:", jax.devices(), flush=True)

n = 8192
ku, kb = jax.random.split(jax.random.PRNGKey(42))


@jax.jit
def make():
    c = jax.random.uniform(ku, (n, n), jnp.float32, -1.0, 1.0)
    with jax.default_matmul_precision("highest"):
        w = jnp.matmul(c.T, c) / n
    a = w + 0.01 * jnp.eye(n, dtype=jnp.float32)
    b = jax.random.uniform(kb, (n,), jnp.float32, -1.0, 1.0)
    return a, b


a32, b = jax.block_until_ready(make())

for ar in ("f32", "bf16"):
    a = a32 if ar == "f32" else a32.astype(jnp.bfloat16)
    for iters in (20, 120):
        cgj = jax.jit(functools.partial(solvers.cg, iters=iters, ar="f32", tol=0.0))
        # 1+2: chained calls with it exposed
        rhs = b
        for call in range(3):
            x, rs, it = jax.block_until_ready(cgj(a, rhs))
            print(
                f"st={ar} iters={iters} call={call} it={int(it)} rs={float(rs):.3e} "
                f"nan={bool(jnp.isnan(x).any())} xmax={float(jnp.abs(x).max()):.3e}",
                flush=True,
            )
            rhs = jnp.clip(x, -1.0, 1.0)
        # 3: naive wall time (upper bound incl. dispatch)
        t = benchmark_function(lambda: cgj(a, b), iters=3)
        print(f"st={ar} iters={iters} wall_ms={t:.2f}", flush=True)

# 3b: NaN semantics of the chain's clip on this backend (XLA TPU max/min
# may suppress NaNs), and a saturated-rhs solve (what chained calls see)
nanv = jnp.float32(float("nan"))
print("clip(nan)=", float(jax.jit(lambda v: jnp.clip(v, -1.0, 1.0))(nanv)), flush=True)
sat = jnp.sign(jax.random.uniform(kb, (n,), jnp.float32, -1.0, 1.0))
cg120 = jax.jit(functools.partial(solvers.cg, iters=120, ar="f32", tol=0.0))
x, rs, it = jax.block_until_ready(cg120(a32, sat))
print(f"saturated rhs: it={int(it)} rs={float(rs):.3e} nan={bool(jnp.isnan(x).any())}",
      flush=True)

# 4: the driver's own slope protocol at both budgets, f32 storage only
for iters in (20, 120):
    def body(c, a, iters=iters):
        x, rs, it = solvers.cg(a, jnp.clip(c, -1.0, 1.0), iters=iters, ar="f32", tol=0.0)
        return x

    ms = benchmark_loop(body, b, args=(a32,))
    print(f"slope iters={iters} per_call_ms={ms:.3f}", flush=True)
