#!/bin/bash
# Full benchmark campaign on the real TPU: CSVs + plots (round-1 artifacts).
set -x
cd /root/repo
export ACCBLAS_CACHE=$HOME/.cache/accblas_jit
R=bench_results
python -m accblas_tpu.bench.dot_benchmark  --sweep pow2 --size $((2**27)) > $R/dot_flops.csv
python -m accblas_tpu.bench.gemv_benchmark --sweep pow2 --size 16384      > $R/gemv_flops.csv
python -m accblas_tpu.bench.trsv_benchmark --sweep pow2 --size 16384      > $R/trsv_flops.csv
python -m accblas_tpu.bench.dot_benchmark  --error --sweep pow2 --size $((2**24)) > $R/dot_error.csv
python -m accblas_tpu.bench.gemv_benchmark --error --sweep pow2 --size 8192       > $R/gemv_error.csv
python -m accblas_tpu.bench.trsv_benchmark --error --sweep pow2 --size 8192 --no-unit > $R/trsv_error.csv
python -m accblas_tpu.bench.plot $R/dot_flops.csv  --kind flops --out plots/v5e_dot_flops.svg  --title "DOT throughput (TPU v5e)"
python -m accblas_tpu.bench.plot $R/gemv_flops.csv --kind flops --out plots/v5e_gemv_flops.svg --title "GEMV throughput (TPU v5e)"
python -m accblas_tpu.bench.plot $R/trsv_flops.csv --kind flops --out plots/v5e_trsv_flops.svg --title "TRSV throughput (TPU v5e)"
python -m accblas_tpu.bench.plot $R/dot_error.csv  --kind error --out plots/v5e_dot_error_median_u-1,1.svg --title "DOT median relative error, u(-1,1)"
python -m accblas_tpu.bench.plot $R/gemv_error.csv --kind error --out plots/v5e_gemv_error_u-1,1.svg --title "GEMV relative error, u(-1,1)"
python -m accblas_tpu.bench.plot $R/trsv_error.csv --kind error --out plots/v5e_trsv_error_u-1,1.svg --title "TRSV relative error (non-unit), u(-1,1)"
python bench.py > $R/headline.json
echo CAMPAIGN_DONE
