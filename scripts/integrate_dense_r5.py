"""Assemble the round-5 dense TRSV refresh into the CSV of record.

Concatenates the campaign_r5r prefix (rows 128..16256) with the
watchdog tail parts (16512..24576; the r5r2 tail + tail1/tail2/...,
whatever landed), validates the 128+256k grid is complete with no
duplicates, prints the integration stats the BENCH_NOTES edit needs
(f32 blocked-route min/median/max over n>=8192 on the dense grid;
endpoint agreement vs trsv_flops.csv), and writes
bench_results/trsv_flops_dense.csv.

Usage: python scripts/integrate_dense_r5.py [--dry-run]
"""

import glob
import statistics
import sys

BR = "/root/repo/bench_results"
OUT = f"{BR}/trsv_flops_dense.csv"
PREFIX = f"{BR}/trsv_flops_dense_r5o.csv"
END = 24576
STEP = 256


def rows_of(path):
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith("n;"):
                header = line
                continue
            out.append((int(line.split(";", 1)[0]), line))
    return header, out


def main(dry=False):
    header, rows = rows_of(PREFIX)
    tails = sorted(glob.glob(f"{BR}/trsv_flops_dense_r5o_tail*.csv"))
    for t in tails:
        h, r = rows_of(t)
        assert h == header, f"header mismatch in {t}"
        rows += r
    seen = {}
    for n, line in rows:
        seen[n] = line  # later parts win (re-runs of a wedged size)
    grid = sorted(seen)
    # the driver grid is 128+256k plus the always-included endpoint
    want = sorted(set(range(128, END + 1, STEP)) | {END})
    missing = [n for n in want if n not in seen]
    extra = [n for n in grid if n not in want]
    print(f"sources: {PREFIX} + {len(tails)} tails -> {len(grid)} sizes")
    if missing:
        print(f"MISSING {len(missing)}: {missing}")
    if extra:
        print(f"extra (non-grid): {extra}")

    names = header.split(";")[1:]
    cols = {nm: i + 1 for i, nm in enumerate(names)}
    f32 = [float(seen[n].split(";")[cols["TRSV fp32"]]) for n in grid if n >= 8192]
    print(f"f32 dense n>=8192: min {min(f32):.1f} / median "
          f"{statistics.median(f32):.1f} / max {max(f32):.1f} ({len(f32)} pts)")

    _, pow2 = rows_of(f"{BR}/trsv_flops.csv")
    pow2 = dict(pow2)
    if END in pow2 and END in seen:
        a = seen[END].split(";")
        b = pow2[END].split(";")
        print("endpoint 24576 dense vs pow2 (CSV of record):")
        for nm in names:
            da, db = float(a[cols[nm]]), float(b[cols[nm]])
            if db:
                print(f"  {nm:28s} {da:9.1f} vs {db:9.1f}  ({da / db - 1:+.1%})")

    if missing:
        print("NOT writing: grid incomplete")
        return 1
    if dry:
        print(f"dry-run: would write {OUT}")
        return 0
    with open(OUT, "w") as f:
        f.write(header + "\n")
        for n in grid:
            f.write(seen[n] + "\n")
    print(f"wrote {OUT} ({len(grid)} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main(dry="--dry-run" in sys.argv[1:]))
