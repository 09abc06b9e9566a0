#!/bin/bash
# Round-3 post-campaign 3: refresh every CSV affected by the zero-copy
# ragged TRSV (7782abd) and the blocked-XLA routing (50e154b, 8aeb250),
# plus the GEMV sweeps for the volume-targeted panel cap (3158649).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=bench_results

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" >> $R/campaign_r3.log
  timeout ${SLOT:-5400} python -m "$@" > $R/$name.csv 2> $R/$name.log
  echo "=== $name exit=$? ($(date +%H:%M:%S))" >> $R/campaign_r3.log
}

run trsv_flops        accblas_tpu.bench.trsv_benchmark --size 24576
run trsv_flops_dense  accblas_tpu.bench.trsv_benchmark --size 24576 --sweep dense
run trsm_flops        accblas_tpu.bench.trsv_benchmark --size 16384 --nrhs 128
run trsv_error        accblas_tpu.bench.trsv_benchmark --size 24576 --error --no-unit
run gemv_flops        accblas_tpu.bench.gemv_benchmark --size 24576
run gemv_flops_dense  accblas_tpu.bench.gemv_benchmark --size 24576 --sweep dense
echo "post3 done $(date +%H:%M:%S)" >> $R/campaign_r3.log
