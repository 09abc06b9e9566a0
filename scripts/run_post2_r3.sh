#!/bin/bash
# Round-3 post-campaign 2: reruns after the extract fix (6c67b7f) and with
# the CG budget fix (ce29cfe) actually in the tree.
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

run solvers     accblas_tpu.bench.solvers_benchmark --size 8192
run trsv_flops  accblas_tpu.bench.trsv_benchmark --size 24576
run trsv_flops_dense accblas_tpu.bench.trsv_benchmark --size 24576 --sweep dense
SLOT=10800 run dot_error accblas_tpu.bench.dot_benchmark --size 536870912 --error
echo "post2 done $(date +%H:%M:%S)" >> $R/campaign_r3.log
