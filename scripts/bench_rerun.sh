#!/bin/bash
# rerun the two flops sweeps that crashed on since-fixed bf16 paths + their plots + headline
set -x
cd /root/repo
export ACCBLAS_CACHE=$HOME/.cache/accblas_jit
R=bench_results
python -m accblas_tpu.bench.dot_benchmark  --sweep pow2 --size $((2**27)) > $R/dot_flops.csv
python -m accblas_tpu.bench.gemv_benchmark --sweep pow2 --size 16384      > $R/gemv_flops.csv
python -m accblas_tpu.bench.plot $R/dot_flops.csv  --kind flops --out plots/v5e_dot_flops.svg  --title "DOT throughput (TPU v5e)"
python -m accblas_tpu.bench.plot $R/gemv_flops.csv --kind flops --out plots/v5e_gemv_flops.svg --title "GEMV throughput (TPU v5e)"
python bench.py > $R/headline.json
echo RERUN_DONE
