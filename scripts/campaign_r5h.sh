#!/bin/bash
# Round-5 part 8: revalidate n=16384 nrhs=512 after the rhs-chunk guard
# (_TRSM_CHUNK_N/_K in ops/trsv.py): the un-chunked run exhausted XLA
# compile resources at every tier (old trsm_rhs512.log); chunked panels
# reuse the proven 128-column programs.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONFAULTHANDLER=1
PIDFILE=/tmp/campaign_r5h.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
  echo "campaign_r5h already running (pid $(cat "$PIDFILE")); exiting" >&2
  exit 1
fi
echo $$ > "$PIDFILE"
LOG=bench_results/campaign_r5h.log
echo "campaign_r5h start $(date +%H:%M:%S)" | tee -a "$LOG"
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
run trsm_rhs512 5400 python -m accblas_tpu.bench.trsv_benchmark --sweep single --size 16384 --nrhs 512
echo "campaign_r5h FINISHED $(date +%H:%M:%S)" | tee -a "$LOG"
