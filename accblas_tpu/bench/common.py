"""Shared benchmark-driver machinery.

Reproduces the reference's driver structure (SURVEY.md §2 C24): a list of
(name, timed-run lambda, error lambda) benchmark entries, a size sweep, and
`;`-delimited CSV on stdout with 16-digit scientific values
(``cuda/dot_benchmark.cu:28,146-158``). Entry 0 is the error reference on the
reference side; here the error oracle is host numpy float64 on the master
data — the same role, one tier stronger.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
from typing import Callable, Sequence

import numpy as np

DELIM = ";"  # reference: cuda/dot_benchmark.cu:28


def enable_compile_cache():
    """Persistent compilation cache: size sweeps recompile per shape, so cache
    across runs (the CUDA reference has no JIT — this is TPU-specific)."""
    import jax

    path = os.environ.get("ACCBLAS_CACHE", os.path.expanduser("~/.cache/accblas_jit"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


@dataclasses.dataclass
class BenchmarkInfo:
    """(name, run, error) tuple — the benchmark_info_t analogue
    (``cuda/dot_benchmark.cu:84-142``)."""

    name: str
    run: Callable[[], object]  # returns device handle(s) to block on
    error: Callable[[], float]  # relative error vs the fp64 oracle


def fmt(v: float) -> str:
    """16-digit scientific, reference ``dot_benchmark.cu:157-158``."""
    return f"{v:.16e}"


def emit_header(first_col: str, names: Sequence[str], file=None):
    print(DELIM.join([first_col] + list(names)), file=file or sys.stdout, flush=True)


def emit_row(size: int, values: Sequence[float], file=None):
    print(DELIM.join([str(size)] + [fmt(v) for v in values]), file=file or sys.stdout, flush=True)


def parse_args(prog: str, default_size: int, min_size: int, extra=None):
    """--error / --size=N (reference flag surface, ``cuda/dot_benchmark.cu:33-68``)
    plus sweep controls."""
    p = argparse.ArgumentParser(
        prog=prog,
        description=f"{prog}: accblas-tpu benchmark driver "
        "(CSV to stdout; see BASELINE.md for the measurement protocol)",
    )
    p.add_argument("--error", action="store_true", help="measure relative error instead of time")
    p.add_argument("--size", type=int, default=default_size, help="maximum sweep size")
    p.add_argument(
        "--sweep",
        choices=["pow2", "dense", "single"],
        default="pow2",
        help="size grid: pow2 = doubling (default), dense = reference-style linear steps, single = only --size",
    )
    p.add_argument("--step", type=int, default=0,
                   help="dense-sweep step override (0 = driver default; the "
                   "reference's grids are step-100 for GEMV/TRSV and step-2e6 "
                   "for DOT — pass --step 256 for the comparable resolution "
                   "class on lane-aligned grids)")
    p.add_argument("--min-size", dest="min_size", type=int, default=0,
                   help="sweep grid start override (0 = driver default) — "
                   "resume an interrupted dense campaign from its last "
                   "completed size without re-measuring the finished rows "
                   "(the drivers flush one CSV row per size, so a killed "
                   "sweep restarts here and the rows concatenate)")
    p.add_argument("--randomizations", type=int, default=10,
                   help="error-mode re-randomizations for the median (reference: 10)")
    p.add_argument("--no-align", dest="align", action="store_false", default=True,
                   help="sweep arbitrary (non-lane-aligned) sizes — the kernels "
                   "handle ragged shapes by masking; the reference's grids are "
                   "arbitrary (step-100 / step-2e6) because CUDA bounds-checks "
                   "per element")
    if extra:
        extra(p)
    args = p.parse_args()
    if args.size < min_size:
        p.error(f"--size must be >= {min_size}")
    return args


def sweep_sizes(args, min_size: int, align: int, dense_step: int):
    """Size grid. All sizes are aligned to `align` (TPU lane/block physics —
    the CUDA reference sweeps arbitrary sizes because its kernels bounds-check
    per element; padding inside the timed region would distort bandwidth)."""

    if not getattr(args, "align", True):
        align = 1
    # --min-size: resume point for interrupted sweeps. Clamped upward only,
    # and kept on the same dense residue class as the default grid (the
    # caller passes a value from the original grid), so resumed rows
    # concatenate seamlessly with the already-flushed CSV prefix.
    min_size = max(min_size, getattr(args, "min_size", 0) or 0)

    def al(v):
        return max(align, (v // align) * align)

    if args.sweep == "single":
        return [al(args.size)]
    if args.sweep == "dense":
        step = getattr(args, "step", 0) or dense_step
        grid = {al(s) for s in range(min_size, args.size + 1, step)}
        grid.add(al(args.size))  # always include the endpoint
        return sorted(grid)
    sizes = []
    s = min_size
    while s <= args.size:
        sizes.append(al(s))
        s *= 2
    if sizes and sizes[-1] != al(args.size):
        sizes.append(al(args.size))
    return sizes


def progress(msg: str):
    """Stderr progress line (the CSV protocol owns stdout); long TPU sweeps
    buffer rows, so this is the live checkpoint signal."""
    print(f"# {msg}", file=sys.stderr, flush=True)


def guarded(fn, label: str) -> float:
    """Run one measurement; a failing tier records NaN instead of killing
    the sweep (rows are buffered — an uncaught crash at one (variant, size)
    would lose every completed measurement)."""
    try:
        return float(fn())
    except Exception as e:  # noqa: BLE001 - deliberate fault isolation
        progress(f"FAILED {label}: {type(e).__name__}: {str(e)[:300]}")
        return float("nan")


def median(vals) -> float:
    """Median over re-randomizations (reference ``dot_benchmark.cu:238-259``)."""
    return float(np.median(np.asarray(vals, np.float64)))


def device_info():
    """Device kind + peak HBM bandwidth (GB/s) for roofline reporting."""
    import jax

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "unknown")
    table = {
        "TPU v4": 1228.0,
        "TPU v5 lite": 819.0,
        "TPU v5e": 819.0,
        "TPU v5": 819.0,
        "TPU v5p": 2765.0,
        "TPU v6 lite": 1640.0,
        "TPU v6e": 1640.0,
    }
    bw = None
    for k, v in table.items():
        if kind.lower().startswith(k.lower()):
            bw = v
    if bw is None:
        bw = table.get(kind, 819.0)
    return kind, bw
