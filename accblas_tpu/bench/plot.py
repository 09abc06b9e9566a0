"""Plot generator for benchmark CSVs.

The reference ships 16 committed matplotlib figures (``plots/``, embedded at
README.md:59-76) but NOT the script that made them (SURVEY.md §1 note "a gap
we fix"). This regenerates the same figure types — FLOPs-vs-size and
relative-error-vs-size per kernel family — from the drivers' `;`-CSV output.

Usage:
    accblas_plots dot_flops.csv --kind flops --out plots/v5e_dot_flops.svg
    python -m accblas_tpu.bench.plot gemv_err.csv --kind error --out plots/v5e_gemv_error.svg
"""

from __future__ import annotations

import argparse
import sys

from .common import DELIM


def read_csv(path):
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    header = lines[0].split(DELIM)
    xcol, names = header[0], header[1:]
    xs, cols = [], [[] for _ in names]
    for ln in lines[1:]:
        parts = ln.split(DELIM)
        xs.append(float(parts[0]))
        for i, v in enumerate(parts[1:]):
            cols[i].append(float(v))
    return xcol, names, xs, cols


def make_plot(path, kind, out, title=None, dpi=150):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    xcol, names, xs, cols = read_csv(path)
    fig, ax = plt.subplots(figsize=(7.0, 4.5))
    markers = ["o", "s", "^", "v", "D", "x", "+", "*"]
    for i, name in enumerate(names):
        ax.plot(xs, cols[i], label=name, marker=markers[i % len(markers)], markersize=3, linewidth=1.2)
    ax.set_xlabel(xcol)
    if kind == "flops":
        ax.set_ylabel("GFLOP/s")
    else:
        ax.set_ylabel("relative error vs fp64")
        ax.set_yscale("log")
    ax.set_xscale("log", base=2)
    ax.grid(True, which="both", alpha=0.3)
    ax.legend(fontsize=8)
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(out, dpi=dpi)
    base = out.rsplit(".", 1)[0]
    if out.endswith(".svg"):
        fig.savefig(base + ".pdf")  # the reference ships svg+pdf pairs
    plt.close(fig)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(prog="accblas_plots")
    p.add_argument("csv", help="driver CSV file")
    p.add_argument("--kind", choices=["flops", "error"], required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--title", default=None)
    args = p.parse_args(argv)
    out = make_plot(args.csv, args.kind, args.out, args.title)
    print(out, file=sys.stderr)


if __name__ == "__main__":
    main()
