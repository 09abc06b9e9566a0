#!/bin/bash
# Round-5 campaign, part 2b — the LU-dependent tail of campaign_r5b, split
# off so it launches only after regen_lu_cache.py finishes (running both
# LU computes on the 1-core host would thrash; see campaign_r5b.sh header).
# Waits (bounded) for the 24576 fp64 LU cache, then:
#   1. probe_r5b        — blocked-XLA df64 TRSM prototype (VERDICT #2)
#   2. trsv_flops_dense — bf16/f16 post-refine-gate recapture (VERDICT #3)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONFAULTHANDLER=1
PIDFILE=/tmp/campaign_r5b2.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
  echo "campaign_r5b2 already running (pid $(cat "$PIDFILE")); exiting" >&2
  exit 1
fi
echo $$ > "$PIDFILE"
LOG=bench_results/campaign_r5b.log
echo "campaign_r5b2 start $(date +%H:%M:%S)" | tee -a "$LOG"

LU=${ACCBLAS_CACHE:-$HOME/.cache/accblas_jit}/lu64_seed42_n24576.npy
for i in $(seq 1 120); do
  [ -f "$LU" ] && break
  sleep 60
done
# single TPU process: also wait for the detached dot_flops_dense capture
# (pass its PID as $1) to exit before touching the chip
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
if [ ! -f "$LU" ]; then
  echo "LU cache never appeared; aborting" | tee -a "$LOG"
  exit 1
fi
echo "LU cache ready ($(date +%H:%M:%S))" | tee -a "$LOG"

run() { # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$LOG"
  timeout -s ABRT "$tmo" "$@" > "bench_results/$name.csv.tmp" 2> "bench_results/$name.log"
  local rc=$?
  echo "=== $name exit=$rc ($(date +%H:%M:%S))" | tee -a "$LOG"
  if [ $rc -eq 0 ]; then mv "bench_results/$name.csv.tmp" "bench_results/$name.csv"; fi
  return $rc
}

echo "=== probe_r5b ($(date +%H:%M:%S))" | tee -a "$LOG"
timeout 3600 python scripts/probe_r5b.py > bench_results/probe_r5b.log 2>&1
echo "=== probe_r5b exit=$? ($(date +%H:%M:%S))" | tee -a "$LOG"

run trsv_flops_dense 14400 python -m accblas_tpu.bench.trsv_benchmark --sweep dense --step 256 --size 24576

echo "campaign_r5b2 FINISHED $(date +%H:%M:%S)" | tee -a "$LOG"
