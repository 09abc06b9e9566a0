#!/bin/bash
# Round-5 part 6 (single TPU process, waits on campaign_r5e): TRSM
# rhs-scaling — the 128-rhs pow2 table exists (trsm_flops.csv); these two
# single-size runs at n=16384 bracket it (nrhs=32/512) so the beyond-parity
# TRSM family has a measured rhs axis (MXU utilization vs panel width).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONFAULTHANDLER=1
PIDFILE=/tmp/campaign_r5f.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
  echo "campaign_r5f already running (pid $(cat "$PIDFILE")); exiting" >&2
  exit 1
fi
echo $$ > "$PIDFILE"
LOG=bench_results/campaign_r5f.log
echo "campaign_r5f start $(date +%H:%M:%S)" | tee -a "$LOG"
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
run() { # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$LOG"
  timeout -s ABRT "$tmo" "$@" > "bench_results/$name.csv.tmp" 2> "bench_results/$name.log"
  local rc=$?
  echo "=== $name exit=$rc ($(date +%H:%M:%S))" | tee -a "$LOG"
  if [ $rc -eq 0 ]; then mv "bench_results/$name.csv.tmp" "bench_results/$name.csv"; fi
  return $rc
}
run trsm_rhs32  3600 python -m accblas_tpu.bench.trsv_benchmark --sweep single --size 16384 --nrhs 32
run trsm_rhs512 3600 python -m accblas_tpu.bench.trsv_benchmark --sweep single --size 16384 --nrhs 512
echo "campaign_r5f FINISHED $(date +%H:%M:%S)" | tee -a "$LOG"
