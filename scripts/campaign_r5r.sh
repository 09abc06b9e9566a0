#!/bin/bash
# campaign_r5r — full dense TRSV refresh on the shipped round-5 routes
# (f8 blocked reroute probe_r5k + narrow block retune probe_r5m/r5n +
# probe_r5p crossover/multi-rhs gates). Replaces the campaign_r5b2-vintage
# trsv_flops_dense.csv whose bf16/f16 columns are pre-retune and whose f8
# column is the superseded 121-GF/s sweep route. Kill-safe (one CSV row
# flushed per size).
cd /root/repo
LOG=bench_results/campaign_r5r.log
PIDFILE=/tmp/campaign_r5r.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
  echo "campaign_r5r already running (pid $(cat "$PIDFILE"))" >&2
  exit 1
fi
echo $$ > "$PIDFILE"
echo "campaign_r5r START $(date +%H:%M:%S)" | tee "$LOG"
timeout -s ABRT 18000 python -m accblas_tpu.bench.trsv_benchmark \
  --sweep dense --step 256 --size 24576 \
  > bench_results/trsv_flops_dense_r5o.csv 2> bench_results/trsv_flops_dense_r5o.log
echo "=== trsv_flops_dense_r5o exit=$? ($(date +%H:%M:%S))" | tee -a "$LOG"
echo "campaign_r5r FINISHED $(date +%H:%M:%S)" | tee -a "$LOG"
rm -f "$PIDFILE"
