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

Timing: chained in-device loops, K-slope (utils.bench.benchmark_loop — the
CUDA-event analogue). Error mode: median relative error over 10
re-randomizations vs the numpy fp64 master-data dot (reference
``cuda/dot_benchmark.cu:162-164,175,238-259``); seed 42, uniform(-1,1),
subnormal-filtered. GFLOP/s = 2n / t.
"""

from __future__ import annotations

import numpy as np

from . import common
from ..utils import MatrixInfo, gen_mtx
from ..utils.bench import benchmark_loop

MIN_SIZE = 2**20
DEFAULT_SIZE = 2**27
ALIGN = 2**13


def _variants(jnp, dotops, dfm):
    """name -> (timing body builder, error fn builder).

    Body builders take (x32, y32, xb, yb) device arrays and return
    (body, carry0); error builders return a float vs-oracle error fn."""

    def chain(c):
        return c.astype(jnp.float32) * 1e-30

    # timing bodies: body(c, x32, y32, xb, yb) — arrays ride as loop args,
    # never as closures (closures bake multi-GB constants into the executable)
    def v_fixed_f32(c, x32, y32, xb, yb):
        return dotops.dot(x32, y32, init=chain(c))

    def v_fixed_bf16(c, x32, y32, xb, yb):
        return dotops.dot(xb, yb, init=chain(c)).astype(jnp.float32)

    def v_acc_df_f32(c, x32, y32, xb, yb):
        return dotops.acc_dot(x32, y32, ar="df64", init=chain(c)).hi

    def v_acc_f32_bf16(c, x32, y32, xb, yb):
        return dotops.acc_dot(xb, yb, ar="f32", init=chain(c))

    def v_acc_df_bf16(c, x32, y32, xb, yb):
        return dotops.acc_dot(xb, yb, ar="df64", init=chain(c)).hi

    # XLA-tier chaining: jnp.dot has no seed input, so the carry perturbs one
    # element of a *carried* copy of y (O(1): while-loop carries alias in
    # place). optimization_barrier tuples proved unable to pin loop-invariant
    # work on this toolchain.
    def v_xla_f32(c, x32, y32, xb, yb):
        s, yc = c
        yc = yc.at[0].add(s * 1e-42)
        return jnp.dot(x32, yc), yc

    def v_xla_bf16(c, x32, y32, xb, yb):
        s, yc = c
        yc = yc.at[0].add((s * 1e-30).astype(yc.dtype))
        return jnp.dot(xb, yc).astype(jnp.float32), yc

    def e_fixed_f32(x32, y32, xb, yb):
        return lambda: float(dotops.dot(x32, y32))

    def e_fixed_bf16(x32, y32, xb, yb):
        return lambda: float(dotops.dot(xb, yb).astype(jnp.float32))

    def e_acc_df_f32(x32, y32, xb, yb):
        return lambda: float(dfm.df_to_f64(dotops.acc_dot(x32, y32, ar="df64")))

    def e_acc_f32_bf16(x32, y32, xb, yb):
        return lambda: float(dotops.acc_dot(xb, yb, ar="f32"))

    def e_acc_df_bf16(x32, y32, xb, yb):
        return lambda: float(dfm.df_to_f64(dotops.acc_dot(xb, yb, ar="df64")))

    def e_xla_f32(x32, y32, xb, yb):
        return lambda: float(jnp.dot(x32, y32))

    def e_xla_bf16(x32, y32, xb, yb):
        return lambda: float(jnp.dot(xb, yb).astype(jnp.float32))

    def c_scalar(arrays):
        return jnp.float32(0.0)

    def c_with_y32(arrays):
        return (jnp.float32(0.0), arrays[1])

    def c_with_ybf(arrays):
        return (jnp.float32(0.0), arrays[3])

    return [
        ("DOT fp32", v_fixed_f32, c_scalar, e_fixed_f32),
        ("DOT bf16", v_fixed_bf16, c_scalar, e_fixed_bf16),
        ("DOT Acc<df64,f32>", v_acc_df_f32, c_scalar, e_acc_df_f32),
        ("DOT Acc<f32,bf16>", v_acc_f32_bf16, c_scalar, e_acc_f32_bf16),
        ("DOT Acc<df64,bf16>", v_acc_df_bf16, c_scalar, e_acc_df_bf16),
        ("XLA DOT fp32", v_xla_f32, c_with_y32, e_xla_f32),
        ("XLA DOT bf16", v_xla_bf16, c_with_ybf, e_xla_bf16),
    ]


def main():
    args = common.parse_args("dot_benchmark", DEFAULT_SIZE, MIN_SIZE)
    common.enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from ..ops import dot as dotops
    from ..ops import df64 as dfm

    sizes = common.sweep_sizes(args, MIN_SIZE, ALIGN, dense_step=2 * 10**6)
    variants = _variants(jnp, dotops, dfm)
    names = [v[0] for v in variants]
    common.emit_header("n", names)

    x64 = gen_mtx(MatrixInfo(1, max(sizes)), seed=42)[0]
    y64 = gen_mtx(MatrixInfo(1, max(sizes)), seed=43)[0]
    x32_full = jax.device_put(x64.astype(np.float32))
    y32_full = jax.device_put(y64.astype(np.float32))
    xb_full = x32_full.astype(jnp.bfloat16)
    yb_full = y32_full.astype(jnp.bfloat16)

    for n in sizes:
        arrays = (x32_full[:n], y32_full[:n], xb_full[:n], yb_full[:n])
        if args.error:
            errs = {nm: [] for nm in names}
            for r in range(args.randomizations):
                if r == 0:
                    xr64, yr64 = x64[:n], y64[:n]
                    arrs = arrays
                else:
                    # re-randomize (reference write_random + convert_from,
                    # cuda/dot_benchmark.cu:195-200)
                    xr64 = gen_mtx(MatrixInfo(1, n), seed=1000 + r)[0]
                    yr64 = gen_mtx(MatrixInfo(1, n), seed=2000 + r)[0]
                    x32 = jax.device_put(xr64.astype(np.float32))
                    y32 = jax.device_put(yr64.astype(np.float32))
                    arrs = (x32, y32, x32.astype(jnp.bfloat16), y32.astype(jnp.bfloat16))
                ref = xr64 @ yr64
                for nm, _, _, e_build in variants:
                    got = e_build(*arrs)()
                    errs[nm].append(abs(got - ref) / abs(ref))
            common.emit_row(n, [common.median(errs[nm]) for nm in names])
        else:
            vals = []
            for nm, v_body, make_c0, _ in variants:
                ms = benchmark_loop(v_body, make_c0(arrays), args=arrays)
                vals.append(2.0 * n / (ms * 1e-3) / 1e9)
            common.emit_row(n, vals)


if __name__ == "__main__":
    main()
