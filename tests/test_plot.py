"""Plot generator smoke test (bench/plot.py — the script the reference never
shipped; SURVEY.md §1 note)."""

import os

from accblas_tpu.bench import plot as plotmod
from accblas_tpu.bench.common import DELIM


def _write_csv(path):
    rows = [
        ["n", "A fp32", "A Acc<f32,bf16>"],
        ["1024", "1.0e+02", "2.0e+02"],
        ["2048", "1.1e+02", "nan"],  # a failed tier records NaN
        ["4096", "1.2e+02", "2.2e+02"],
    ]
    with open(path, "w") as f:
        for r in rows:
            f.write(DELIM.join(r) + "\n")


def test_read_csv_roundtrip(tmp_path):
    p = tmp_path / "x.csv"
    _write_csv(p)
    xcol, names, xs, cols = plotmod.read_csv(str(p))
    assert xcol == "n" and names == ["A fp32", "A Acc<f32,bf16>"]
    assert xs == [1024.0, 2048.0, 4096.0]
    assert cols[0] == [100.0, 110.0, 120.0]
    assert cols[1][1] != cols[1][1]  # NaN parses


def test_make_plot_svg_and_pdf(tmp_path):
    p = tmp_path / "x.csv"
    _write_csv(p)
    out = tmp_path / "fig.svg"
    got = plotmod.make_plot(str(p), "flops", str(out), title="t")
    assert got == str(out) and os.path.getsize(out) > 0
    # the reference ships svg+pdf pairs — the generator emits both
    assert os.path.getsize(tmp_path / "fig.pdf") > 0


def test_make_plot_error_logscale(tmp_path):
    p = tmp_path / "x.csv"
    _write_csv(p)
    out = tmp_path / "err.png"
    plotmod.make_plot(str(p), "error", str(out))
    assert os.path.getsize(out) > 0
