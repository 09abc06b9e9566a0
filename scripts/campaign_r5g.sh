#!/bin/bash
# Round-5 part 7: complete the TRSM rhs-scaling bracket at n=8192
# (nrhs=32/512; 128 is in trsm_flops.csv). nrhs=512 at n=16384 exhausts
# single-chip HBM (trsm_rhs512.log, every entry incl. XLA) — that point is
# documented as the single-chip memory ceiling; ptrsm is the scale-out.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONFAULTHANDLER=1
PIDFILE=/tmp/campaign_r5g.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
  echo "campaign_r5g already running (pid $(cat "$PIDFILE")); exiting" >&2
  exit 1
fi
echo $$ > "$PIDFILE"
LOG=bench_results/campaign_r5g.log
echo "campaign_r5g start $(date +%H:%M:%S)" | tee -a "$LOG"
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
run trsm8192_rhs32  3600 python -m accblas_tpu.bench.trsv_benchmark --sweep single --size 8192 --nrhs 32
run trsm8192_rhs512 3600 python -m accblas_tpu.bench.trsv_benchmark --sweep single --size 8192 --nrhs 512
echo "campaign_r5g FINISHED $(date +%H:%M:%S)" | tee -a "$LOG"
