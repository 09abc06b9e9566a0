#!/bin/bash
# campaign_r5o — TRSV recapture after the round-5 narrow-storage block
# retune (_small_block_for: bf16/f16/f8 single-rhs at n >= 4096 take
# BLOCK_VEC=1024 blocks, probe_r5m + probe_r5n). Two captures, both
# kill-safe (the driver flushes one CSV row per size; staging files are
# written directly, no .tmp/mv, so a killed run keeps completed rows):
#   1. full pow2 refresh  -> trsv_flops_r5o.csv        (~25 min)
#   2. full dense refresh -> trsv_flops_dense_r5o.csv  (~3 h) — also
#      retires the "superseded sweep-vintage f8 column" caveat for good.
# f32/df64 columns are retune-invariant (f32 keeps block=512) and double
# as the agreement check against the committed CSVs (±2%).
cd /root/repo
LOG=bench_results/campaign_r5o.log
PIDFILE=/tmp/campaign_r5o.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
  echo "campaign_r5o already running (pid $(cat "$PIDFILE"))" >&2
  exit 1
fi
echo $$ > "$PIDFILE"

echo "campaign_r5o START $(date +%H:%M:%S)" | tee "$LOG"

LU=${ACCBLAS_CACHE:-$HOME/.cache/accblas_jit}/lu64_seed42_n24576.npy
while [ ! -f "$LU" ]; do sleep 60; done
echo "LU cache ready ($(date +%H:%M:%S))" | tee -a "$LOG"

while [ -f /tmp/bench.pid ] && kill -0 "$(cat /tmp/bench.pid)" 2>/dev/null; do
  sleep 30
done
echo "TPU free ($(date +%H:%M:%S))" | tee -a "$LOG"

echo "=== trsv_flops_r5o ($(date +%H:%M:%S))" | tee -a "$LOG"
timeout -s ABRT 7200 python -m accblas_tpu.bench.trsv_benchmark \
  --sweep pow2 --size 24576 \
  > bench_results/trsv_flops_r5o.csv 2> bench_results/trsv_flops_r5o.log
echo "=== trsv_flops_r5o exit=$? ($(date +%H:%M:%S))" | tee -a "$LOG"

echo "=== trsv_flops_dense_r5o ($(date +%H:%M:%S))" | tee -a "$LOG"
timeout -s ABRT 18000 python -m accblas_tpu.bench.trsv_benchmark \
  --sweep dense --step 256 --size 24576 \
  > bench_results/trsv_flops_dense_r5o.csv 2> bench_results/trsv_flops_dense_r5o.log
echo "=== trsv_flops_dense_r5o exit=$? ($(date +%H:%M:%S))" | tee -a "$LOG"

echo "campaign_r5o FINISHED $(date +%H:%M:%S)" | tee -a "$LOG"
