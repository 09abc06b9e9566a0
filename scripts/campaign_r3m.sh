#!/bin/bash
# Round-3m recovery campaign: re-measure everything touched by the
# narrow-storage TRSV routing fixes (upfront f32 cast at VMEM-scale n,
# Acc<f32,f16> column), re-run the TRSM panel that timed out during the
# 19:30-20:10 tunnel outage, and run the f8-GEMV embed-width probe.
# One TPU process at a time; everything logs to bench_results/.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONFAULTHANDLER=1
LOG=bench_results/campaign_r3.log

run() { # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$LOG"
  timeout -s ABRT "$tmo" "$@" > "bench_results/$name.csv.tmp" 2> "bench_results/$name.log"
  local rc=$?
  echo "=== $name exit=$rc ($(date +%H:%M:%S))" | tee -a "$LOG"
  if [ $rc -eq 0 ]; then mv "bench_results/$name.csv.tmp" "bench_results/$name.csv"; fi
  return $rc
}

run trsv_flops 1800 python -m accblas_tpu.bench.trsv_benchmark --size 24576
run trsv_flops_dense 2400 python -m accblas_tpu.bench.trsv_benchmark --size 24576 --sweep dense
# faulthandler + ABRT => stack dump into the log if it hangs again
run trsm_flops 3600 python -m accblas_tpu.bench.trsv_benchmark --size 16384 --nrhs 128
run trsv_error 2400 python -m accblas_tpu.bench.trsv_benchmark --size 24576 --error --no-unit

echo "=== probe_r3l ($(date +%H:%M:%S))" | tee -a "$LOG"
timeout 2400 python scripts/probe_r3l.py > bench_results/probe_r3l.log 2>&1
echo "=== probe_r3l exit=$? ($(date +%H:%M:%S))" | tee -a "$LOG"
echo "=== probe_r3n ($(date +%H:%M:%S))" | tee -a "$LOG"
timeout 1800 python scripts/probe_r3n.py > bench_results/probe_r3n.log 2>&1
echo "=== probe_r3n exit=$? ($(date +%H:%M:%S))" | tee -a "$LOG"
echo "campaign_r3m done $(date +%H:%M:%S)" | tee -a "$LOG"
