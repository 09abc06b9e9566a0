#!/bin/bash
# campaign_r5l — full pow2 TRSV flops refresh after the probe_r5k f8
# reroute (CLAUDE.md round-5 integration checklist item: trsv_flops_r5k.csv
# staging; kill-safe — the driver flushes one CSV row per size, and this
# script writes STRAIGHT to the staging file, no .tmp/mv, so a killed run
# keeps its completed rows).
#
# Preconditions handled here: (1) the LU disk cache (wiped by the VM
# reboot) must be regenerated first; (2) only one process may hold the
# TPU, so wait for any bench.py capture to exit.
cd /root/repo
LOG=bench_results/campaign_r5l.log
PIDFILE=/tmp/campaign_r5l.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
  echo "campaign_r5l already running (pid $(cat "$PIDFILE"))" >&2
  exit 1
fi
echo $$ > "$PIDFILE"

echo "campaign_r5l START $(date +%H:%M:%S)" | tee "$LOG"

LU=${ACCBLAS_CACHE:-$HOME/.cache/accblas_jit}/lu64_seed42_n24576.npy
while [ ! -f "$LU" ]; do sleep 60; done
# the regen writes with np.save in one call; give the final write a beat
sleep 30
echo "LU cache ready ($(date +%H:%M:%S))" | tee -a "$LOG"

while [ -f /tmp/bench.pid ] && kill -0 "$(cat /tmp/bench.pid)" 2>/dev/null; do
  sleep 30
done
echo "TPU free ($(date +%H:%M:%S))" | tee -a "$LOG"

echo "=== trsv_flops_r5k ($(date +%H:%M:%S))" | tee -a "$LOG"
timeout -s ABRT 14400 python -m accblas_tpu.bench.trsv_benchmark \
  --sweep pow2 --size 24576 \
  > bench_results/trsv_flops_r5k.csv 2> bench_results/trsv_flops_r5k.log
echo "=== trsv_flops_r5k exit=$? ($(date +%H:%M:%S))" | tee -a "$LOG"

echo "campaign_r5l FINISHED $(date +%H:%M:%S)" | tee -a "$LOG"
