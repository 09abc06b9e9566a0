#!/bin/bash
# Round-3 TRSV/TRSM CSV refresh after the narrow-storage blocked-XLA routing
# + the new Acc<f32,f16> column. One TPU process at a time; logs to files.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
L=bench_results/campaign_r3.log
run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" >> $L
  timeout 2400 python -m "$@" > bench_results/$name.csv.tmp 2> bench_results/$name.log
  rc=$?
  if [ $rc -eq 0 ]; then
    grep '^[0-9n]' bench_results/$name.csv.tmp > bench_results/$name.csv
  fi
  rm -f bench_results/$name.csv.tmp
  echo "=== $name exit=$rc ($(date +%H:%M:%S))" >> $L
}
run trsv_flops accblas_tpu.bench.trsv_benchmark --size 24576
run trsv_flops_dense accblas_tpu.bench.trsv_benchmark --size 24576 --sweep dense
run trsm_flops accblas_tpu.bench.trsv_benchmark --size 16384 --nrhs 128
run trsv_error accblas_tpu.bench.trsv_benchmark --size 24576 --error --no-unit
echo "campaign_r3k done $(date +%H:%M:%S)" >> $L
