"""Driver smoke tests: CSV schema, flag surface, error protocol (CPU mesh,
small single sizes)."""

import sys

import numpy as np


def _run_main(module, argv, capsys):
    old = sys.argv
    sys.argv = argv
    try:
        module.main()
    finally:
        sys.argv = old
    out = capsys.readouterr().out.strip().splitlines()
    header = out[0].split(";")
    rows = [ln.split(";") for ln in out[1:]]
    return header, rows


def test_dot_driver_error_mode(capsys):
    from accblas_tpu.bench import dot_benchmark as d

    header, rows = _run_main(
        d,
        ["dot_benchmark", "--error", "--size=1048576", "--sweep=single", "--randomizations=2"],
        capsys,
    )
    assert header[0] == "n"
    assert "DOT Acc<df64,f32>" in header and "XLA DOT fp32" in header
    assert len(rows) == 1 and len(rows[0]) == len(header)
    vals = dict(zip(header[1:], map(float, rows[0][1:])))
    # accessor df64 must sit at/below the f32 storage floor; bf16 tiers worse
    assert vals["DOT Acc<df64,f32>"] < 1e-6
    assert vals["DOT Acc<f32,bf16>"] < 0.02
    assert vals["DOT bf16"] > vals["DOT Acc<df64,f32>"]


def test_gemv_driver_error_mode(capsys):
    from accblas_tpu.bench import gemv_benchmark as g

    header, rows = _run_main(
        g, ["gemv_benchmark", "--error", "--size=1024", "--sweep=single"], capsys
    )
    assert header[0] == "rows" and len(rows) == 1
    vals = dict(zip(header[1:], map(float, rows[0][1:])))
    assert vals["GEMV Acc<df64,f32>"] < 5e-7
    assert vals["GEMV fp32"] < 1e-5
    assert vals["GEMV bf16"] > vals["GEMV Acc<f32,bf16>"]


def test_trsv_driver_error_mode(capsys):
    from accblas_tpu.bench import trsv_benchmark as t

    header, rows = _run_main(
        t,
        ["trsv_benchmark", "--error", "--size=1024", "--sweep=single", "--no-unit"],
        capsys,
    )
    assert header[0] == "n" and len(rows) == 1
    vals = dict(zip(header[1:], map(float, rows[0][1:])))
    assert vals["TRSV fp32"] < 1e-2
    assert vals["XLA TRSV fp32"] < 1e-2
    assert vals["TRSV Acc<df64,f32>"] <= vals["TRSV fp32"] * 1.5


def test_benchmark_loop_on_cpu():
    import jax.numpy as jnp

    from accblas_tpu.utils.bench import benchmark_loop

    body = lambda c: c * 1.0000001 + 1e-9
    ms = benchmark_loop(body, jnp.float32(1.0), reps=1, target_ms=20.0)
    assert ms >= 0.0


def test_dot_driver_speed_mode_rows_per_size(capsys):
    """Speed mode emits one complete CSV row per size (size-outer sweep,
    kill-safe: a mid-sweep death keeps every finished size — the round-5
    dense capture lost 22 min of points to the old buffer-to-the-end
    emitter when the host rebooted)."""
    from accblas_tpu.bench import dot_benchmark as d

    header, rows = _run_main(
        d, ["dot_benchmark", "--size=32768", "--sweep=pow2"], capsys
    )
    assert header[0] == "n"
    assert len(rows) == 2 and all(len(r) == len(header) for r in rows)
    assert [int(r[0]) for r in rows] == [16384, 32768]
    vals = dict(zip(header[1:], map(float, rows[0][1:])))
    assert np.isfinite(vals["DOT fp32"]) and vals["DOT fp32"] > 0


def test_plot_generation(tmp_path):
    from accblas_tpu.bench import plot

    csv = tmp_path / "demo.csv"
    csv.write_text("n;A;B\n1024;1.0e+00;2.0e+00\n2048;2.0e+00;3.0e+00\n")
    out = tmp_path / "demo.svg"
    plot.make_plot(str(csv), "flops", str(out))
    assert out.exists() and (tmp_path / "demo.pdf").exists()


def test_dot_driver_no_align_ragged(capsys):
    """--no-align sweeps arbitrary sizes (the reference's grids are
    arbitrary); kernels mask the ragged tail."""
    from accblas_tpu.bench import dot_benchmark as d

    header, rows = _run_main(
        d,
        ["dot_benchmark", "--error", "--size=1048577", "--sweep=single",
         "--no-align", "--randomizations=1"],
        capsys,
    )
    assert rows[0][0] == "1048577"
    vals = dict(zip(header[1:], map(float, rows[0][1:])))
    assert vals["DOT Acc<df64,f32>"] < 1e-6
    assert vals["DOT df64 oracle (device)"] < 1e-10


def test_trsm_driver_mode(capsys):
    from accblas_tpu.bench import trsv_benchmark as t

    header, rows = _run_main(
        t, ["trsv_benchmark", "--error", "--size=1024", "--sweep=single",
            "--nrhs=8", "--no-unit"],
        capsys,
    )
    assert header[1] == "TRSM fp32"
    vals = dict(zip(header[1:], map(float, rows[0][1:])))
    assert vals["TRSM fp32"] < 1e-3
    # the one-pass DF-carried sweep ties the f32 tier at this size (both sit
    # at the f32 *storage* floor; with only 2 sweep blocks there is no
    # cross-block accumulation error for the df64 carry to win back — the
    # gap opens at larger n, see bench_results/trsv_error.csv)
    assert vals["TRSM Acc<df64,f32>"] <= vals["TRSM fp32"] * 1.2


def test_pcg_table_emits_per_variant(capsys):
    """--pcg emits one flushed CSV row PER VARIANT (kill-safe: the round-4
    capture died after 1 of 4 variants and the buffer-to-the-end emitter
    lost everything); convergence parity sharded vs single-chip per tier."""
    import math

    from accblas_tpu.bench import solvers_benchmark as s

    header, rows = _run_main(
        s, ["solvers_benchmark", "--size", "512", "--pcg", "--iters", "40"],
        capsys,
    )
    assert header == ["n", "variant", "pcg resid", "cg resid"]
    assert [r[1] for r in rows] == ["f32/f32", "f32/df64", "bf16/f32",
                                    "bf16/df64"]
    for r in rows:
        rp, rs = float(r[2]), float(r[3])
        assert math.isfinite(rp) and math.isfinite(rs)
        # sharded recurrence tracks the single-chip one per tier (same
        # class of partial convergence, not bitwise)
        assert rp < 1.0 and rs < 1.0
        assert rp <= rs * 10 + 1e-12 and rs <= rp * 10 + 1e-12


def test_solvers_driver_smoke(capsys, monkeypatch):
    """CG rate/residual driver at a tiny size with shortened iteration
    budgets (the real campaign runs n=8192 on hardware)."""
    from accblas_tpu.bench import solvers_benchmark as s

    monkeypatch.setattr(s, "ITERS_LO", 2)
    monkeypatch.setattr(s, "ITERS_HI", 8)
    header, rows = _run_main(
        s, ["solvers_benchmark", "--size", "512", "--sweep", "single"], capsys
    )
    assert header[1].startswith("CG f32/f32")
    vals = list(map(float, rows[0][1:]))
    assert len(vals) == 8  # 4 variants x (rate, resid)
    import math

    # rates positive; residuals finite and reduced (the Wishart+ridge system
    # only partially converges in the smoke budget)
    assert vals[0] > 0 and 0 < vals[1] < 1.0
    assert all(math.isfinite(v) for v in vals)
