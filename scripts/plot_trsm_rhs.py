"""Assemble the TRSM rhs-scaling figure from the per-(n,nrhs) capture CSVs.

The rhs axis (round 5): nrhs 8/16/32/128/512 at n=8192 and n=16384, per
tier — the 8/16 narrow band rides the blocked route since probe_r5p
(campaign_r5s/r5t captures). Sources: trsm8192_rhs{8,16,32,512}.csv,
trsm_rhs{8,16,32,512}.csv (n=16384), trsm_flops.csv (the 128-rhs pow2
table). House style follows
accblas_tpu/bench/plot.py; tier->hue assignments match the column order
of v5e_trsm_flops.svg so color follows the tier across the figure
family. Identity is never color-alone: per-tier markers + legend, XLA
dashed.

Usage (CPU-only):
    JAX_PLATFORMS=cpu python scripts/plot_trsm_rhs.py
"""

import sys

sys.path.insert(0, "/root/repo")

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from accblas_tpu.bench.plot import read_csv

BR = "/root/repo/bench_results"

# tier -> (CSV column, color index in v5e_trsm_flops column order, marker)
TIERS = [
    ("TRSM fp32", "C0", "o", "fp32"),
    ("TRSM Acc<f32,bf16>", "C3", "v", "Acc<f32,bf16>"),
    ("TRSM Acc<f32,f8e4m3>", "C5", "x", "Acc<f32,f8e4m3>"),
    ("TRSM Acc<df64,f32>", "C6", "+", "Acc<df64,f32>"),
    ("XLA TRSM fp32", "C8", "o", "XLA TRSM fp32"),
]

SOURCES = {
    8192: {8: "trsm8192_rhs8.csv", 16: "trsm8192_rhs16.csv",
           32: "trsm8192_rhs32.csv", 128: "trsm_flops.csv",
           512: "trsm8192_rhs512.csv"},
    16384: {8: "trsm_rhs8.csv", 16: "trsm_rhs16.csv",
            32: "trsm_rhs32.csv", 128: "trsm_flops.csv",
            512: "trsm_rhs512.csv"},
}


def col(fname, n, name):
    _, names, xs, cols = read_csv(f"{BR}/{fname}")
    row = xs.index(float(n))
    return cols[names.index(name)][row] / 1e3  # GF/s -> TF/s


def main(out="/root/repo/plots/v5e_trsm_rhs.svg"):
    fig, axes = plt.subplots(1, 2, figsize=(9.0, 4.2), sharey=True)
    for ax, n in zip(axes, (8192, 16384)):
        ks = sorted(SOURCES[n])
        ends = []
        for cname, c, m, label in TIERS:
            ys = [col(SOURCES[n][k], n, cname) for k in ks]
            ls = "--" if label.startswith("XLA") else "-"
            ax.plot(ks, ys, label=label, color=c, marker=m, markersize=4,
                    linewidth=1.2, linestyle=ls)
            ends.append(ys[-1])
        # stagger endpoint labels so converging lines stay readable: sort
        # by value and force >= 2.2 TF/s of vertical separation
        order = sorted(range(len(ends)), key=lambda i: ends[i])
        pos = []
        for i in order:
            y = ends[i]
            if pos and y - pos[-1][1] < 2.2:
                y = pos[-1][1] + 2.2
            pos.append((i, y))
        for i, y in pos:
            ax.annotate(f"{ends[i]:.1f}", (ks[-1], ends[i]), fontsize=7,
                        xytext=(4, (y - ends[i]) * 4.2), va="center",
                        textcoords="offset points", color="0.25")
        ax.set_xscale("log", base=2)
        ax.set_xticks(ks, [str(k) for k in ks])
        ax.set_xlabel("nrhs")
        ax.set_title(f"n = {n}" + (" (512 rhs chunked)" if n == 16384 else ""),
                     fontsize=10)
        ax.grid(True, which="both", alpha=0.3)
    axes[0].set_ylabel("TFLOP/s")
    axes[0].legend(fontsize=8)
    fig.suptitle("TRSM rhs scaling, TPU v5e", fontsize=11)
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    fig.savefig(out.rsplit(".", 1)[0] + ".pdf")
    print(out, file=sys.stderr)


if __name__ == "__main__":
    main(*sys.argv[1:])
