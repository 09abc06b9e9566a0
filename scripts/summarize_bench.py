"""Summarize bench_results/*.csv: endpoint rows, roofline fractions, and
reference-baseline comparisons (BASELINE.md A100 endpoints) in markdown.

Usage: python scripts/summarize_bench.py [bench_results_dir]
"""

from __future__ import annotations

import math
import os
import sys

HBM = 819.0  # v5e GB/s

# bytes per element-pair (DOT) / per matrix element (GEMV/TRSV) by column
BYTES = {
    "fp32": 4, "bf16": 2, "f16": 2, "f8e4m3": 1,
    "<df64,f32>": 4, "<f32,bf16>": 2, "<df64,bf16>": 2,
    "<f32,f16>": 2, "<f32,f8e4m3>": 1, "<f32,f32>": 4,
    "<bf16,bf16>": 2,  # identity-accessor tier (round 4)
}


def read(path):
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    header = lines[0].split(";")
    rows = [[p for p in ln.split(";")] for ln in lines[1:]]
    return header, rows


def col_bytes(name):
    for k, v in sorted(BYTES.items(), key=lambda kv: -len(kv[0])):
        if k in name:
            return v
    return 4


def fmt_flops(path, kernel, dot=False):
    header, rows = read(path)
    if not rows:
        return f"(no rows in {path})\n"
    last = rows[-1]
    n = int(last[0])
    out = [f"### {kernel} endpoint (n = {n})\n"]
    out.append("| variant | GFLOP/s | % storage roofline |")
    out.append("|---|---|---|")
    for name, val in zip(header[1:], last[1:]):
        v = float(val)
        if math.isnan(v):
            out.append(f"| {name} | NaN | — |")
            continue
        b = col_bytes(name)
        roof = HBM * 2 / (2 * b) if dot else HBM * 2 / b
        out.append(f"| {name} | {v:.1f} | {100*v/roof:.0f}% |")
    out.append("")
    return "\n".join(out)


def fmt_error(path, kernel):
    header, rows = read(path)
    if not rows:
        return f"(no rows in {path})\n"
    first, last = rows[0], rows[-1]
    out = [f"### {kernel} error: first n = {first[0]}, endpoint n = {last[0]}\n"]
    out.append("| variant | err @ first | err @ endpoint | flat? |")
    out.append("|---|---|---|---|")
    for i, name in enumerate(header[1:], 1):
        a, b = float(first[i]), float(last[i])
        flat = "yes" if (b == 0 or (a > 0 and b / a < 4)) else "GROWS"
        out.append(f"| {name} | {a:.2e} | {b:.2e} | {flat} |")
    out.append("")
    return "\n".join(out)


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "bench_results"
    specs = [
        ("dot_flops.csv", "DOT flops", "flops", True),
        ("gemv_flops.csv", "GEMV flops", "flops", False),
        ("trsv_flops.csv", "TRSV flops", "flops", False),
        ("trsm_flops.csv", "TRSM flops (128 rhs)", "flops", False),
        ("dot_error.csv", "DOT", "error", None),
        ("gemv_error.csv", "GEMV", "error", None),
        ("trsv_error.csv", "TRSV (non-unit)", "error", None),
        ("gemv_flops_dense.csv", "GEMV dense sweep", "flops", False),
        ("trsv_flops_dense.csv", "TRSV dense sweep", "flops", False),
        ("pcg_convergence.csv", "pcg vs cg (mesh)", "error", None),
        ("dot_flops_ragged.csv", "DOT ragged sizes", "flops", True),
        ("gemv_flops_ragged.csv", "GEMV ragged sizes", "flops", False),
    ]
    for fn, kernel, kind, dot in specs:
        p = os.path.join(d, fn)
        if not os.path.exists(p):
            print(f"(missing {p})\n")
            continue
        print(fmt_flops(p, kernel, dot) if kind == "flops" else fmt_error(p, kernel))


if __name__ == "__main__":
    main()
