#!/bin/bash
# Round-5 campaign, part 3 (single TPU process, strictly sequential) —
# runs AFTER campaign_r5b2 finishes and after any probe_r5b adoption is
# committed (the df64 TRSM route decision):
#   1. trsm_flops  — recapture with the adopted df64 route (VERDICT #2)
#   2. bench.py    — end-of-round headline verify (writes BENCH_DETAILS.json)
# Launch: nohup bash scripts/campaign_r5c.sh [wait_pid] > /tmp/campaign_r5c.out 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONFAULTHANDLER=1
PIDFILE=/tmp/campaign_r5c.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
  echo "campaign_r5c already running (pid $(cat "$PIDFILE")); exiting" >&2
  exit 1
fi
echo $$ > "$PIDFILE"
LOG=bench_results/campaign_r5c.log
echo "campaign_r5c start $(date +%H:%M:%S)" | tee -a "$LOG"

# single TPU process: wait for a prior holder (pass its PID as $1)
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

# ceiling decomposition for the adopted df64 TRSM route (VERDICT #2):
# feedforward GEMM SOL (G1/G2) + shipped/norefine split at 4096/16384
run probe_r5d 3600 python scripts/probe_r5d.py

run trsm_flops 7200 python -m accblas_tpu.bench.trsv_benchmark --sweep pow2 --size 16384 --nrhs 128
# pow2 TRSV refresh: picks up the Acc<f32,f8e4m3> column the driver grew in
# 76b22cc (no committed CSV carries it yet) on the endpoint CSV of record
run trsv_flops 7200 python -m accblas_tpu.bench.trsv_benchmark --sweep pow2 --size 24576

echo "=== bench_verify ($(date +%H:%M:%S))" | tee -a "$LOG"
timeout 2400 python bench.py > /tmp/bench_verify.out 2> /tmp/bench_verify.err
echo "=== bench_verify exit=$? ($(date +%H:%M:%S))" | tee -a "$LOG"

echo "campaign_r5c FINISHED $(date +%H:%M:%S)" | tee -a "$LOG"
