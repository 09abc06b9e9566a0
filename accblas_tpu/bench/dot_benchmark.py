"""DOT benchmark driver — the ``dot_benchmark`` executable analogue
(reference ``cuda/dot_benchmark.cu``).

Variants (CSV columns; reference set at ``cuda/dot_benchmark.cu:95-142``,
remapped to the TPU dtype lattice — fp64 arithmetic → df64, fp32 storage
under wider arithmetic → bf16 storage under f32 — and extended down-lattice
with the f16 and stochastically-rounded f8e4m3 storage tiers):

  DOT fp32 / bf16               — fixed precision, hand-written Pallas
  DOT Acc<df64,f32> [precise]   — accessor, fp64-class arithmetic over f32
  DOT Acc<f32,bf16>             — accessor, f32 over bf16 (headline)
  DOT Acc<df64,bf16>            — accessor, widest mainstream gap
  DOT Acc<f32,f16>, <f32,f8e4m3> — narrow/8-bit storage tiers
  XLA DOT fp32/bf16             — vendor tier (cuBLAS analogue)
  DOT df64 oracle (device)      — error mode only: df64 over split-f64
                                  storage (the cuBLAS-fp64 cross-check line,
                                  reference ``cuda/utils.cuh:315-332``)

Data: generated ON DEVICE from seed-42-keyed threefry streams with a
host-replayed fp64 master (utils.devgen — threefry is bit-identical across
CPU/TPU backends, so the oracle sees exactly the master the device rounds
from). This replaces the reference's H→D copies, which through a remote-TPU
tunnel would cost hours at the published endpoint (n≈5.4e8,
``cuda/dot_benchmark.cu:26-27``).

Timing: chained in-device loops, K-slope (utils.bench.benchmark_loop — the
CUDA-event analogue); results buffered and emitted at the end, like the
reference (``cuda/dot_benchmark.cu:177-189``). Error mode: each variant runs
once through ``benchmark_function(..., skip=True)`` (the reference's error-
mode execution path, ``cuda/utils.cuh:236-262``), then the median relative
error over ``--randomizations`` re-draws vs the numpy fp64 master dot
(``cuda/dot_benchmark.cu:162-164,175,238-259``). GFLOP/s = 2n / t.
"""

from __future__ import annotations

import numpy as np

from . import common
from ..utils.bench import benchmark_function, benchmark_loop

MIN_SIZE = 2**14  # round 3: cover the resident regime (reference starts at 1e6,
# cuda/dot_benchmark.cu:26; the resident-mode claims below 2^20 need CSV rows)
DEFAULT_SIZE = 2**27
ALIGN = 2**13

# (column name, storage family, kind, acc_dot kwargs)
VARIANTS = [
    ("DOT fp32", "f32", "fixed", {}),
    ("DOT bf16", "bf16", "fixed", {}),
    # identity-accessor tiers: same storage and arithmetic type through the
    # Range — must match the fixed tiers, demonstrating the accessor is
    # zero-cost at equal types (reference Acc<fp64,fp64>/Acc<fp32,fp32>,
    # ``cuda/dot_benchmark.cu:95-142``)
    ("DOT Acc<f32,f32>", "f32", "acc32", {}),
    ("DOT Acc<bf16,bf16>", "bf16", "accbf16", {}),
    ("DOT Acc<df64,f32>", "f32", "df", {}),
    ("DOT Acc<df64,f32> precise", "f32", "df", {"precise": True}),
    ("DOT Acc<f32,bf16>", "bf16", "acc32", {}),
    ("DOT Acc<df64,bf16>", "bf16", "df", {}),
    ("DOT Acc<f32,f16>", "f16", "acc32", {}),
    ("DOT Acc<f32,f8e4m3>", "f8", "acc32", {}),
    ("XLA DOT fp32", "f32", "xla", {}),
    ("XLA DOT bf16", "bf16", "xla", {}),
    ("DOT df64 oracle (device)", "oracle", "oracle", {}),  # error mode only
]


def _family_arrays(family: str, x32, y32, seed: int, r: int):
    """Derive one storage family's device operands from the f32 copies."""
    import jax
    import jax.numpy as jnp

    from ..utils import devgen
    from ..utils.sr import sr_round_device_chunked

    if family == "f32":
        return x32, y32
    if family == "bf16":
        return x32.astype(jnp.bfloat16), y32.astype(jnp.bfloat16)
    if family == "f16":
        return x32.astype(jnp.float16), y32.astype(jnp.float16)
    if family == "f8":
        k = devgen._key(seed, "sr", r)
        kx, ky = jax.random.split(k)
        return (
            sr_round_device_chunked(x32, "f8e4m3", kx),
            sr_round_device_chunked(y32, "f8e4m3", ky),
        )
    raise ValueError(family)


def _timing_body(kind: str, kw: dict, jnp, dotops):
    """body(c, x, y) with carry c = (scalar, y-copy): each iteration perturbs
    one element of the carried y by the previous result before the dot.

    The perturbation is the ONLY loop-carried data dependence that pins the
    work inside the timing loop for every execution path: the XLA-composed
    resident/f16 modes are jnp graphs whose reduction XLA happily hoists if
    only the `init` epilogue touches the carry (measured: PFLOP/s fiction).
    The y-copy rides as the loop carry, so the .at[0].add aliases in place —
    O(1) per iteration, no bandwidth distortion (verified: the XLA fp32 tier
    measures 92% of HBM roofline at n=2^29 with this structure). Arrays ride
    as loop args, never closures (closures bake multi-GB constants into the
    executable)."""

    def mk(fn):
        def body(c, x, y):
            s, yc = c
            yc = yc.at[0].add((s * 1e-30).astype(yc.dtype))
            return fn(x, yc), yc

        return body

    if kind == "fixed":
        return mk(lambda x, y: dotops.dot(x, y).astype(jnp.float32))
    if kind == "df":
        return mk(lambda x, y: dotops.acc_dot(x, y, ar="df64", **kw).hi)
    if kind == "acc32":
        return mk(lambda x, y: dotops.acc_dot(x, y, ar="f32"))
    if kind == "accbf16":
        return mk(lambda x, y: dotops.acc_dot(x, y, ar="bf16").astype(jnp.float32))
    return mk(lambda x, y: dotops.xla_dot(x, y).astype(jnp.float32))


def main():
    args = common.parse_args("dot_benchmark", DEFAULT_SIZE, MIN_SIZE)
    common.enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from ..ops import df64 as dfm
    from ..ops import dot as dotops
    from ..ops import oracle
    from ..utils import devgen

    seed = 42
    sizes = common.sweep_sizes(args, MIN_SIZE, ALIGN, dense_step=2 * 10**6)
    max_n = max(sizes)
    variants = [v for v in VARIANTS if args.error or v[2] != "oracle"]
    names = [v[0] for v in variants]
    # error mode buffers rows (the median needs every randomization before a
    # row is complete); speed mode emits one flushed row per size — the
    # round-5 dense DOT capture died mid-sweep in a host reboot and the then
    # buffer-to-the-end emitter lost 22 minutes of measurements (the exact
    # failure mode of the reference's own DOT driver,
    # ``cuda/dot_benchmark.cu:177-189``)
    results = {n: {} for n in sizes}

    if args.error:
        errs = {n: {nm: [] for nm in names} for n in sizes}

        # one jitted callable per variant, shared across randomizations and
        # sizes (eager dispatch through the remote tunnel costs ~30 ms/op —
        # the resident small-n tiers are dozens of ops, so unjitted error
        # runs measured minutes per variant)
        def _jfn(kind, kw):
            if kind == "fixed":
                return jax.jit(lambda x, y: dotops.dot(x, y))
            if kind == "df":
                return jax.jit(lambda x, y: dotops.acc_dot(x, y, ar="df64", **kw))
            if kind == "acc32":
                return jax.jit(lambda x, y: dotops.acc_dot(x, y, ar="f32"))
            if kind == "accbf16":
                return jax.jit(lambda x, y: dotops.acc_dot(x, y, ar="bf16"))
            return jax.jit(lambda x, y: dotops.xla_dot(x, y))

        jfns = {nm: _jfn(kind, kw) for nm, f, kind, kw in variants if kind != "oracle"}
        joracle = jax.jit(
            lambda xh, xl, yh, yl: oracle.dot_df64(xh, xl, yh, yl)
        )
        for r in range(args.randomizations):
            # fresh master draw per randomization (the write_random +
            # convert_from rerun, cuda/dot_benchmark.cu:195-200) — device and
            # host replay the same threefry stream
            x32 = devgen.gen_f32((max_n,), seed, "dot_x", r)
            y32 = devgen.gen_f32((max_n,), seed, "dot_y", r)
            x64 = devgen.master_f64((max_n,), seed, "dot_x", r)
            y64 = devgen.master_f64((max_n,), seed, "dot_y", r)
            refs = {n: float(x64[:n] @ y64[:n]) for n in sizes}
            del x64, y64

            fams = sorted({v[1] for v in variants} - {"oracle"})
            for fam in fams:
                xf, yf = _family_arrays(fam, x32, y32, seed, r)
                for nm, f, kind, kw in variants:
                    if f != fam or kind == "oracle":
                        continue
                    for n in sizes:
                        def eval_once(n=n, nm=nm, kind=kind):
                            out = _run_error(
                                lambda: jfns[nm](_lead(xf, n), _lead(yf, n))
                            )
                            got = (
                                float(dfm.df_to_f64(out))
                                if kind == "df"
                                else float(jnp.asarray(out, jnp.float32))
                            )
                            return abs(got - refs[n]) / abs(refs[n])

                        errs[n][nm].append(common.guarded(eval_once, f"{nm} n={n}"))
                    common.progress(f"r={r} {nm} done")
                if fam != "f32":
                    del xf, yf
            if any(v[1] == "oracle" for v in variants):
                # split-f64 oracle operands replace the f32 copies (hi IS the
                # f32 copy bit-for-bit) — free them first, the splits plus
                # per-size slices are the HBM high-water mark at n=2^29
                del x32, y32
                xh, xl = devgen.split_df64(None, (max_n,), seed, "dot_x", r)
                yh, yl = devgen.split_df64(None, (max_n,), seed, "dot_y", r)
                onm = next(v[0] for v in variants if v[1] == "oracle")
                for n in sizes:
                    def eval_oracle(n=n):
                        out = _run_error(
                            lambda: joracle(
                                _lead(xh, n), _lead(xl, n), _lead(yh, n), _lead(yl, n)
                            )
                        )
                        got = float(dfm.df_to_f64(out))
                        return abs(got - refs[n]) / abs(refs[n])

                    errs[n][onm].append(common.guarded(eval_oracle, f"oracle n={n}"))
                common.progress(f"r={r} oracle done")
                del xh, xl, yh, yl
        for n in sizes:
            results[n] = {nm: common.median(errs[n][nm]) for nm in names}
        common.emit_header("n", names)
        for n in sizes:
            common.emit_row(n, [results[n][nm] for nm in names])
    else:
        x32 = devgen.gen_f32((max_n,), seed, "dot_x", 0)
        y32 = devgen.gen_f32((max_n,), seed, "dot_y", 0)
        fams = sorted({v[1] for v in variants})
        bodies = {nm: _timing_body(kind, kw, jnp, dotops)
                  for nm, f, kind, kw in variants}
        common.emit_header("n", names)
        for n in sizes:
            # size-outer so the row flushes as soon as its last variant
            # lands; family operands derive from leading slices of the f32
            # master (a cast/SR pass per (family, size) — microseconds on
            # device next to the timed loop, and only one family's copy is
            # ever resident)
            xs32, ys32 = _lead(x32, n), _lead(y32, n)
            row = {}
            for fam in fams:
                xf, yf = _family_arrays(fam, xs32, ys32, seed, 0)
                for nm, f, kind, kw in variants:
                    if f != fam:
                        continue
                    c0 = (jnp.float32(0.0), yf)
                    row[nm] = common.guarded(
                        lambda: 2.0 * n / (benchmark_loop(bodies[nm], c0, args=(xf, yf)) * 1e-3) / 1e9,
                        f"{nm} n={n}",
                    )
                    common.progress(f"{nm} n={n}: {row[nm]:.1f} GFLOP/s")
                del xf, yf
            common.emit_row(n, [row[nm] for nm in names])


def _lead(a, n: int):
    """Leading view, identity at full length (a[:n] at n == len dispatches a
    device copy — a multi-GiB duplicate at the 2^29 endpoint)."""
    return a if a.shape[0] == n else a[:n]


def _run_error(fn):
    """Execute a benchmark entry once through the reference's measurement
    protocol with skip=True (``cuda/utils.cuh:236-262`` — error mode runs the
    kernel exactly once, synchronized, untimed) and hand back its result."""
    box = {}

    def call():
        box["v"] = fn()
        return box["v"]

    benchmark_function(call, skip=True)
    return box["v"]


if __name__ == "__main__":
    main()
