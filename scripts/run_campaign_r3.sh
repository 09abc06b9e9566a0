#!/bin/bash
# Round-3 endpoint sweep campaign (real TPU, sequential — ONE process owns
# the chip). Each sweep streams CSV to bench_results/ with a .log sidecar.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=bench_results

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" >> $R/campaign_r3.log
  timeout 5400 python -m "$@" > $R/$name.csv 2> $R/$name.log
  echo "=== $name exit=$? ($(date +%H:%M:%S))" >> $R/campaign_r3.log
}

# TRSV family first (the round's headline claims)
run trsv_flops  accblas_tpu.bench.trsv_benchmark --size 24576
run trsm_flops  accblas_tpu.bench.trsv_benchmark --size 16384 --nrhs 128
run trsv_error  accblas_tpu.bench.trsv_benchmark --size 24576 --error --no-unit

# GEMV: aligned sweep, then the ragged singles
run gemv_flops  accblas_tpu.bench.gemv_benchmark --size 24576
run gemv_ragged_10100 accblas_tpu.bench.gemv_benchmark --size 10100 --sweep single --no-align
run gemv_ragged_20300 accblas_tpu.bench.gemv_benchmark --size 20300 --sweep single --no-align
run gemv_ragged_24503 accblas_tpu.bench.gemv_benchmark --size 24503 --sweep single --no-align
run gemv_error  accblas_tpu.bench.gemv_benchmark --size 24576 --error

# DOT
run dot_flops   accblas_tpu.bench.dot_benchmark --size 536870912
run dot_ragged_123456789 accblas_tpu.bench.dot_benchmark --size 123456789 --sweep single --no-align
run dot_error   accblas_tpu.bench.dot_benchmark --size 536870912 --error

# Solvers (beyond-reference application tier)
run solvers     accblas_tpu.bench.solvers_benchmark --size 8192

echo "campaign done $(date +%H:%M:%S)" >> $R/campaign_r3.log
