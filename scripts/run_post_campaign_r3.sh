#!/bin/bash
# Post-campaign: rerun the TRSV sweeps (small-n df64 now routes through the
# fused sweep — the campaign's first trsv_flops/error ran before 81f2717),
# then the part-3 tuning probes.
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

run solvers     accblas_tpu.bench.solvers_benchmark --size 8192
run trsv_flops  accblas_tpu.bench.trsv_benchmark --size 24576
run trsv_error  accblas_tpu.bench.trsv_benchmark --size 24576 --error --no-unit
# rerun: first pass hit a Mosaic crash on bf16 ragged (now pad-fallback)
run dot_ragged_123456789 accblas_tpu.bench.dot_benchmark --size 123456789 --sweep single --no-align

echo "=== probe_r3c ($(date +%H:%M:%S))" >> $R/campaign_r3.log
timeout 3600 python scripts/probe_r3c.py > $R/probe_r3c.log 2>&1
echo "=== probe_r3c exit=$? ($(date +%H:%M:%S))" >> $R/campaign_r3.log

# dense (reference-style step) sweeps — the linear-grid parity story
run gemv_flops_dense accblas_tpu.bench.gemv_benchmark --size 24576 --sweep dense
run trsv_flops_dense accblas_tpu.bench.trsv_benchmark --size 24576 --sweep dense

# dot_error needs more than the campaign's 90-min slot (16 sizes x 10
# randomizations; results buffer until the end, reference-style)
echo "=== dot_error rerun ($(date +%H:%M:%S))" >> $R/campaign_r3.log
timeout 10800 python -m accblas_tpu.bench.dot_benchmark --size 536870912 --error \
  > $R/dot_error.csv 2> $R/dot_error.log
echo "=== dot_error exit=$? ($(date +%H:%M:%S))" >> $R/campaign_r3.log
echo "post-campaign done $(date +%H:%M:%S)" >> $R/campaign_r3.log
