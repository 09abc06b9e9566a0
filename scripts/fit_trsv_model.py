"""Fit the blocked-TRSV time model to measured sweeps (VERDICT r3 #7).

The blocked route solves n/B block rows sequentially; each step is a
B-wide diagonal solve (serial, latency L per step) plus a rank-B panel
GEMV update (bandwidth-bound). Model:

    t(n) = c0 + (n/B) * L + bytes(n) / BW
         = c0 + c1 * n + c2 * n^2       with c1 = L/B, c2 = 4/(2*BW)

(the swept triangle is ~n^2/2 f32 elements = 2n^2 bytes; flops = n^2).

Two fits:
  1. dense-sweep fit: least squares of [1, n, n^2] on t(n) from the fixed
     fp32 column of a dense CSV -> per-term shares at the endpoint. If the
     n^2 term's implied bandwidth ~ HBM peak and the n term carries the
     rest, the chain is latency-bound, not schedule-bound.
  2. block-grid fit (probe_r4d): at fixed n, t(B) = K + (n/B) * L is
     linear in 1/B -> direct L and the B->inf asymptote K vs the
     bandwidth floor.

Usage:
  python scripts/fit_trsv_model.py --csv bench_results/trsv_flops_dense.csv \
      --column "TRSV fp32" --block 512
  python scripts/fit_trsv_model.py --grid "512:358.9,1024:367.3,2048:371.0" \
      --n 24576
"""
import argparse

import numpy as np

HBM_GBPS = 819.0


def parse_csv(path, column):
    with open(path) as f:
        header = f.readline().strip().split(";")
        idx = header.index(column)
        ns, ts = [], []
        for line in f:
            parts = line.strip().split(";")
            if len(parts) <= idx:
                continue
            n = int(float(parts[0]))
            gfs = float(parts[idx])
            if not np.isfinite(gfs) or gfs <= 0:
                continue
            ns.append(n)
            ts.append(n * n / (gfs * 1e9))  # seconds
    return np.asarray(ns, np.float64), np.asarray(ts, np.float64)


def fit_dense(ns, ts, block):
    # weight by 1/t so the small-n points (microseconds) aren't drowned by
    # the endpoint (milliseconds) in the residual
    basis = np.stack([np.ones_like(ns), ns, ns * ns], axis=1)
    w = 1.0 / ts
    coef, *_ = np.linalg.lstsq(basis * w[:, None], ts * w, rcond=None)
    c0, c1, c2 = coef
    bw = 2.0 / c2 / 1e9 if c2 > 0 else float("inf")  # GB/s
    lat_us = c1 * block * 1e6
    print(f"dense fit over {len(ns)} points:")
    print(f"  c0 (dispatch)        = {c0*1e6:8.2f} us")
    print(f"  c1*n (chain)         : L = {lat_us:.3f} us per {block}-row "
          f"block step")
    print(f"  c2*n^2 (stream)      : implied BW = {bw:.1f} GB/s "
          f"({100*bw/HBM_GBPS:.1f}% of HBM peak)")
    for n in (int(ns[-1]), 24576, 16384, 4096):
        if n > ns[-1] or n < ns[0]:
            continue
        tt = c0 + c1 * n + c2 * n * n
        sh = np.array([c0, c1 * n, c2 * n * n]) / tt
        gfs = n * n / tt / 1e9
        print(f"  n={n:6d}: model {gfs:6.1f} GF/s | shares "
              f"dispatch {sh[0]*100:4.1f}% chain {sh[1]*100:4.1f}% "
              f"stream {sh[2]*100:4.1f}%")
    # speed-of-light at the endpoint if the chain term vanished
    n = int(ns[-1])
    t_sol = c0 + c2 * n * n
    print(f"  chain-free ceiling at n={n}: {n*n/t_sol/1e9:.1f} GF/s")


def fit_grid(pairs, n):
    bs = np.array(sorted(pairs), np.float64)
    ts = np.array([n * n / (pairs[b] * 1e9) for b in sorted(pairs)])
    basis = np.stack([np.ones_like(bs), n / bs], axis=1)
    coef, *_ = np.linalg.lstsq(basis, ts, rcond=None)
    k, lat = coef
    print(f"block-grid fit at n={n} ({len(bs)} block sizes):")
    print(f"  L = {lat*1e6:.3f} us per block step")
    print(f"  B->inf asymptote K = {k*1e3:.3f} ms "
          f"-> {n*n/k/1e9:.1f} GF/s "
          f"(bandwidth floor {n*n*2/ (HBM_GBPS*1e9) *1e3:.3f} ms "
          f"-> {HBM_GBPS/2:.0f} GF/s-equiv)")
    for b in sorted(pairs):
        tm = k + (n / b) * lat
        print(f"  B={int(b):5d}: measured {pairs[b]:6.1f} GF/s, "
              f"model {n*n/tm/1e9:6.1f} GF/s")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--csv")
    p.add_argument("--column", default="TRSV fp32")
    p.add_argument("--block", type=int, default=512)
    p.add_argument("--grid", help="comma list B:GFs, e.g. 512:358,1024:367")
    p.add_argument("--n", type=int, default=24576)
    p.add_argument("--min-n", type=int, default=1024,
                   help="drop sub-VMEM sizes that ride the resident route")
    args = p.parse_args()
    if args.csv:
        ns, ts = parse_csv(args.csv, args.column)
        keep = ns >= args.min_n
        fit_dense(ns[keep], ts[keep], args.block)
    if args.grid:
        pairs = {}
        for tok in args.grid.split(","):
            b, g = tok.split(":")
            pairs[float(b)] = float(g)
        fit_grid(pairs, args.n)
    if not args.csv and not args.grid:
        p.error("need --csv and/or --grid")


if __name__ == "__main__":
    main()
