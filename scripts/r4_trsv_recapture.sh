#!/bin/bash
# Round-4 targeted recapture after the narrow-storage refine-gate fix
# (refine = f32 storage only): trsv_flops pow2 endpoint sweep, then
# trsv_error, so the CSVs of record reflect shipped routing.
# ONE instance only (pidfile /tmp/r4_trsv_recapture.pid).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONFAULTHANDLER=1
PIDFILE=/tmp/r4_trsv_recapture.pid
# single-instance guard: two concurrent runs would contend for the
# single-process TPU (CLAUDE.md hard failure mode) — kill -0 by PID from
# the pidfile, never by pattern
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
  echo "r4_trsv_recapture already running (pid $(cat "$PIDFILE")); exiting" >&2
  exit 1
fi
echo $$ > "$PIDFILE"
LOG=bench_results/r4_trsv_recapture.log
echo "r4_trsv_recapture start $(date +%H:%M:%S)" | tee -a "$LOG"

run() { # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$LOG"
  timeout -s ABRT "$tmo" "$@" > "bench_results/$name.csv.tmp" 2> "bench_results/$name.log"
  local rc=$?
  echo "=== $name exit=$rc ($(date +%H:%M:%S))" | tee -a "$LOG"
  if [ $rc -eq 0 ]; then mv "bench_results/$name.csv.tmp" "bench_results/$name.csv"; fi
  return $rc
}

run trsv_flops 2400 python -m accblas_tpu.bench.trsv_benchmark --size 24576
run trsv_error 3600 python -m accblas_tpu.bench.trsv_benchmark --size 24576 --error --no-unit
echo "r4_trsv_recapture FINISHED $(date +%H:%M:%S)" | tee -a "$LOG"
