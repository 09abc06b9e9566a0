#!/bin/bash
# Round-2 benchmark campaign: sweeps to the reference's PUBLISHED endpoints
# (DOT n=2^29 ≈ 5.37e8 vs the reference's 5.35e8, cuda/dot_benchmark.cu:26-27;
# GEMV/TRSV 24576 vs 24500/24000, gemv_benchmark.cu:30-31, trsv_benchmark.cu:29)
# plus the new tier columns (f16, f8e4m3, df64-precise), the device oracle in
# error mode, TRSM, and arbitrary (non-aligned) size measurements.
# Each step is independent; rerun any that fail. Expect ~5-6 h total.
set -x
cd /root/repo
export ACCBLAS_CACHE=$HOME/.cache/accblas_jit
R=bench_results
mkdir -p $R plots

# --- flops sweeps to the endpoints ---
python -m accblas_tpu.bench.dot_benchmark  --sweep pow2 --size $((2**29)) > $R/dot_flops.csv  2> $R/dot_flops.log
python -m accblas_tpu.bench.gemv_benchmark --sweep pow2 --size 24576      > $R/gemv_flops.csv 2> $R/gemv_flops.log
python -m accblas_tpu.bench.trsv_benchmark --sweep pow2 --size 24576      > $R/trsv_flops.csv 2> $R/trsv_flops.log

# --- TRSM (multi-rhs, new capability) ---
python -m accblas_tpu.bench.trsv_benchmark --sweep pow2 --size 16384 --nrhs 128 > $R/trsm_flops.csv 2> $R/trsm_flops.log

# --- error sweeps to the endpoints (device oracle column included) ---
python -m accblas_tpu.bench.dot_benchmark  --error --sweep pow2 --size $((2**29)) > $R/dot_error.csv  2> $R/dot_error.log
python -m accblas_tpu.bench.gemv_benchmark --error --sweep pow2 --size 24576      > $R/gemv_error.csv 2> $R/gemv_error.log
python -m accblas_tpu.bench.trsv_benchmark --error --sweep pow2 --size 24576 --no-unit > $R/trsv_error.csv 2> $R/trsv_error.log
python -m accblas_tpu.bench.trsv_benchmark --error --sweep pow2 --size 16384 --nrhs 128 --no-unit > $R/trsm_error.csv 2> $R/trsm_error.log

# --- arbitrary (non-aligned) sizes: the reference's grids are arbitrary ---
python -m accblas_tpu.bench.dot_benchmark  --sweep dense --no-align --size 9000000 > $R/dot_flops_ragged.csv 2>> $R/dot_flops.log
python -m accblas_tpu.bench.dot_benchmark  --sweep single --no-align --size 123456789 | tail -1 >> $R/dot_flops_ragged.csv
python -m accblas_tpu.bench.dot_benchmark  --sweep single --no-align --size 300000007 | tail -1 >> $R/dot_flops_ragged.csv
python -m accblas_tpu.bench.gemv_benchmark --sweep single --no-align --size 10100 > $R/gemv_flops_ragged.csv 2>> $R/gemv_flops.log
python -m accblas_tpu.bench.gemv_benchmark --sweep single --no-align --size 20300 | tail -1 >> $R/gemv_flops_ragged.csv

# --- plots ---
python -m accblas_tpu.bench.plot $R/dot_flops.csv  --kind flops --out plots/v5e_dot_flops.svg  --title "DOT throughput (TPU v5e)"
python -m accblas_tpu.bench.plot $R/gemv_flops.csv --kind flops --out plots/v5e_gemv_flops.svg --title "GEMV throughput (TPU v5e)"
python -m accblas_tpu.bench.plot $R/trsv_flops.csv --kind flops --out plots/v5e_trsv_flops.svg --title "TRSV throughput (TPU v5e)"
python -m accblas_tpu.bench.plot $R/trsm_flops.csv --kind flops --out plots/v5e_trsm_flops.svg --title "TRSM throughput, 128 rhs (TPU v5e)"
python -m accblas_tpu.bench.plot $R/dot_error.csv  --kind error --out plots/v5e_dot_error_median_u-1,1.svg --title "DOT median relative error, u(-1,1)"
python -m accblas_tpu.bench.plot $R/gemv_error.csv --kind error --out plots/v5e_gemv_error_u-1,1.svg --title "GEMV relative error, u(-1,1)"
python -m accblas_tpu.bench.plot $R/trsv_error.csv --kind error --out plots/v5e_trsv_error_u-1,1.svg --title "TRSV relative error (non-unit), u(-1,1)"
python -m accblas_tpu.bench.plot $R/trsm_error.csv --kind error --out plots/v5e_trsm_error_u-1,1.svg --title "TRSM relative error (non-unit, 128 rhs), u(-1,1)"

# --- headline ---
python bench.py > $R/headline.json
echo ENDPOINT_CAMPAIGN_DONE
