"""Headline benchmark — prints ONE JSON line for the driver.

Metric: accessor mixed-precision DOT throughput with half-width storage —
the reference repo's headline benchmark, hardware-mapped:

  reference (A100): DOT Acc<fp64 arith, fp32 storage>  ≈ 354 GFLOP/s
                    (BASELINE.md, plots/a100_dot_flops.svg endpoint n≈5.35e8)
  here (TPU):       DOT Acc<f32 arith, bf16 storage>   at n = 2^29 ≈ 5.37e8

Both run arithmetic at twice the storage width and are HBM-bandwidth-bound at
2 bytes... 4 bytes per element-pair respectively of their native widths — the
"accessor runs at storage speed" claim measured at the same n, so GFLOP/s are
directly comparable across the two machines' HBM. vs_baseline = value / 354.

Timing: chained in-device loops, K-slope (utils.bench.benchmark_loop) — the
CUDA-event analogue that excludes host/tunnel dispatch latency. Details for
all kernel families land in BENCH_DETAILS.json.
"""

from __future__ import annotations

import json
import sys

N_DOT = 2**29  # matches the reference sweep endpoint n ≈ 5.35e8
N_GEMV = 16384
BASELINE_DOT_ACC_GFLOPS = 354.0  # A100 Acc<fp64,fp32> endpoint, BASELINE.md


def main():
    from accblas_tpu.bench.common import device_info, enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from accblas_tpu.ops import dot as dotops
    from accblas_tpu.ops import gemv as gemvops
    from accblas_tpu.utils.bench import benchmark_loop

    kind, hbm_gbps = device_info()
    details = {"device": kind, "hbm_peak_gbps": hbm_gbps}

    # ---- headline: DOT Acc<f32, bf16> at n = 2^29 ----
    # data generated on device (seed-42 threefry, uniform(-1,1) — see
    # utils.devgen): the H→D copy of 4 GiB would cost minutes through the
    # tunnel and timing is data-independent
    from accblas_tpu.utils import devgen

    xb = devgen.gen_f32((N_DOT,), 42, "dot_x").astype(jnp.bfloat16)
    yb = devgen.gen_f32((N_DOT,), 42, "dot_y").astype(jnp.bfloat16)

    ms = benchmark_loop(
        lambda c, xb, yb: dotops.acc_dot(xb, yb, ar="f32", init=c * 1e-30),
        jnp.float32(0.0),
        args=(xb, yb),
    )
    dot_gflops = 2.0 * N_DOT / (ms * 1e-3) / 1e9
    dot_gbps = 2.0 * 2 * N_DOT / (ms * 1e-3) / 1e9
    details["dot_acc_f32_bf16"] = {
        "n": N_DOT,
        "ms": ms,
        "gflops": dot_gflops,
        "eff_gbps": dot_gbps,
        "pct_hbm_roofline": 100.0 * dot_gbps / hbm_gbps,
    }
    del xb, yb

    # ---- context: GEMV Acc<f32, bf16> at 16384^2 ----
    ab = devgen.gen_f32((N_GEMV, N_GEMV), 42, "gemv_a").astype(jnp.bfloat16)
    xg = devgen.gen_f32((N_GEMV,), 42, "gemv_x").astype(jnp.bfloat16)
    rg = devgen.gen_f32((N_GEMV,), 42, "gemv_res")
    # timing-body rule: with static beta=0 res is never read, so the carry
    # must flow through x (one-element perturbation, the driver's pattern) —
    # res-only chaining would let XLA hoist the matvec on any XLA-composed
    # routing and report PFLOP/s fiction
    def gemv_body(c, ab, xg):
        xc = xg.at[0].add((c[0].astype(jnp.float32) * 1e-30).astype(xg.dtype))
        return gemvops.acc_gemv(ab, xc, c, 1.0, 0.0, ar="f32")

    ms_g = benchmark_loop(gemv_body, rg, args=(ab, xg))
    gemv_gflops = 2.0 * N_GEMV * N_GEMV / (ms_g * 1e-3) / 1e9
    gemv_gbps = 2.0 * N_GEMV * N_GEMV / (ms_g * 1e-3) / 1e9  # 2 B/elem, 2 flop/elem
    details["gemv_acc_f32_bf16"] = {
        "n": N_GEMV,
        "ms": ms_g,
        "gflops": gemv_gflops,
        "eff_gbps": gemv_gbps,
        "pct_hbm_roofline": 100.0 * gemv_gbps / hbm_gbps,
    }

    del ab, xg, rg

    # ---- context: TRSV fixed f32 vs fused one-pass Acc<df64,f32> ----
    # round 3 claimed the last storage-speed property: the df64 tier carries
    # DF pairs inside the one-pass sweep (ops/trsv.py) instead of a 3-pass
    # refinement. Device-random well-conditioned triangle (timing is
    # data-independent; the LU-factored accuracy campaign lives in the
    # trsv_benchmark driver).
    n_trsv = 16384
    key = jax.random.PRNGKey(0)
    at = jax.random.uniform(key, (n_trsv, n_trsv), jnp.float32, -1, 1)
    # unit-diagonal solves never read the diagonal — condition the UNIT
    # triangle by scaling the off-diagonals (|L_ij| ~ 1/n keeps back-
    # substitution bounded; a diagonal boost would be a dead no-op here),
    # same recipe as __graft_entry__'s TRSM operand
    at = at * jnp.float32(1.0 / n_trsv)
    bt = jnp.ones((n_trsv,), jnp.float32)
    from accblas_tpu.ops import trsv as trsvops

    # default routing = the shipped fixed tier (XLA-composed blocked
    # substitution since 50e154b); resident=False pins the Pallas sweep —
    # the schedule the df64 tier shares, so sweep/df64 is the
    # same-schedule storage-speed ratio
    ms_t32 = benchmark_loop(
        lambda c, at: trsvops.trsv(at, jnp.clip(c, -1.0, 1.0), "upper", True),
        bt, args=(at,),
    )
    ms_t32_sweep = benchmark_loop(
        lambda c, at: trsvops.trsv(at, jnp.clip(c, -1.0, 1.0), "upper", True,
                                   resident=False),
        bt, args=(at,),
    )
    ms_tdf = benchmark_loop(
        lambda c, at: trsvops.acc_trsv(at, jnp.clip(c, -1.0, 1.0), "upper", True,
                                       ar="df64", resident=False),
        bt, args=(at,),
    )
    details["trsv_16384"] = {
        "fixed_f32_gflops": n_trsv * n_trsv / (ms_t32 * 1e-3) / 1e9,
        "fixed_f32_sweep_gflops": n_trsv * n_trsv / (ms_t32_sweep * 1e-3) / 1e9,
        "acc_df64_f32_gflops": n_trsv * n_trsv / (ms_tdf * 1e-3) / 1e9,
        "df64_over_fixed_speed_ratio": ms_t32 / ms_tdf,
        "df64_over_sweep_speed_ratio": ms_t32_sweep / ms_tdf,
    }
    del at, bt

    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(details, f, indent=2)
    print(json.dumps(details, indent=2), file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "dot_acc_half_storage_gflops",
                "value": round(dot_gflops, 1),
                "unit": "GFLOP/s",
                "vs_baseline": round(dot_gflops / BASELINE_DOT_ACC_GFLOPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
