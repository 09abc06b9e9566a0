#!/bin/bash
# Round-5 part 5 (single TPU process): TRSM error table — CSV-grade error
# columns for the adopted blocked-XLA df64 TRSM route (probe-log evidence
# promoted to a bench_results table). Convention matches trsv_error
# (pow2, --no-unit, errors vs scipy fp64 solve of the same triangle).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONFAULTHANDLER=1
PIDFILE=/tmp/campaign_r5e.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
  echo "campaign_r5e already running (pid $(cat "$PIDFILE")); exiting" >&2
  exit 1
fi
echo $$ > "$PIDFILE"
LOG=bench_results/campaign_r5e.log
echo "campaign_r5e start $(date +%H:%M:%S)" | tee -a "$LOG"
run() { # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$LOG"
  timeout -s ABRT "$tmo" "$@" > "bench_results/$name.csv.tmp" 2> "bench_results/$name.log"
  local rc=$?
  echo "=== $name exit=$rc ($(date +%H:%M:%S))" | tee -a "$LOG"
  if [ $rc -eq 0 ]; then mv "bench_results/$name.csv.tmp" "bench_results/$name.csv"; fi
  return $rc
}
run trsm_error 7200 python -m accblas_tpu.bench.trsv_benchmark --error --sweep pow2 --size 16384 --nrhs 128 --no-unit
echo "campaign_r5e FINISHED $(date +%H:%M:%S)" | tee -a "$LOG"
