#!/bin/bash
# campaign_r5o2 — fresh-VM relaunch of the queued round-5 tail, reordered
# so the short high-value captures land before the 3 h dense sweep and so
# probe_r5p's gate findings can be integrated BEFORE the dense capture
# runs over the 2176-3584 crossover band:
#   1. pow2 TRSV refresh      -> trsv_flops_r5o.csv   (~25 min; pow2 sizes
#      are invariant to any crossover-gate move, so safe to run first)
#   2. probe_r5p              -> probe_r5p.log        (~30-60 min)
#   3. TRSV error recapture   -> trsv_error_r5q.csv   (~1-3 h; pow2 sizes)
# The dense refresh is launched SEPARATELY after probe_r5p integration.
# All captures are kill-safe (driver flushes one CSV row per size).
cd /root/repo
LOG=bench_results/campaign_r5o.log
PIDFILE=/tmp/campaign_r5o.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
  echo "campaign_r5o2 already running (pid $(cat "$PIDFILE"))" >&2
  exit 1
fi
echo $$ > "$PIDFILE"

echo "campaign_r5o2 START $(date +%H:%M:%S)" | tee "$LOG"

LU=${ACCBLAS_CACHE:-$HOME/.cache/accblas_jit}/lu64_seed42_n24576.npy
while [ ! -f "$LU" ]; do sleep 60; done
echo "LU cache ready ($(date +%H:%M:%S))" | tee -a "$LOG"

echo "=== trsv_flops_r5o ($(date +%H:%M:%S))" | tee -a "$LOG"
timeout -s ABRT 7200 python -m accblas_tpu.bench.trsv_benchmark \
  --sweep pow2 --size 24576 \
  > bench_results/trsv_flops_r5o.csv 2> bench_results/trsv_flops_r5o.log
echo "=== trsv_flops_r5o exit=$? ($(date +%H:%M:%S))" | tee -a "$LOG"

echo "=== probe_r5p ($(date +%H:%M:%S))" | tee -a "$LOG"
timeout -s ABRT 5400 python scripts/probe_r5p.py \
  > bench_results/probe_r5p.log 2>&1
echo "=== probe_r5p exit=$? ($(date +%H:%M:%S))" | tee -a "$LOG"

echo "=== trsv_error_r5q ($(date +%H:%M:%S))" | tee -a "$LOG"
timeout -s ABRT 10800 python -m accblas_tpu.bench.trsv_benchmark \
  --error --sweep pow2 --size 24576 --no-unit \
  > bench_results/trsv_error_r5q.csv 2> bench_results/trsv_error_r5q.log
echo "=== trsv_error_r5q exit=$? ($(date +%H:%M:%S))" | tee -a "$LOG"

echo "campaign_r5o2 FINISHED $(date +%H:%M:%S)" | tee -a "$LOG"
rm -f "$PIDFILE"
