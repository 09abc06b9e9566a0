#!/bin/bash
# campaign_r5s — extend the measured TRSM rhs axis into the narrow band
# (nrhs=8/16 at n=16384) that probe_r5p just rerouted onto the blocked
# schedule for narrow storage (e764e0c). Same protocol as campaign_r5f's
# rhs captures. Waits for campaign_r5r (dense refresh) to release the TPU.
cd /root/repo
LOG=bench_results/campaign_r5s.log
PIDFILE=/tmp/campaign_r5s.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
  echo "campaign_r5s already running (pid $(cat "$PIDFILE"))" >&2
  exit 1
fi
echo $$ > "$PIDFILE"
while [ -f /tmp/campaign_r5r.pid ] && kill -0 "$(cat /tmp/campaign_r5r.pid)" 2>/dev/null; do
  sleep 120
done
echo "campaign_r5s START $(date +%H:%M:%S)" | tee "$LOG"
for K in 8 16; do
  timeout -s ABRT 3600 python -m accblas_tpu.bench.trsv_benchmark \
    --sweep single --size 16384 --nrhs $K \
    > bench_results/trsm_rhs$K.csv 2> bench_results/trsm_rhs$K.log
  echo "=== trsm_rhs$K exit=$? ($(date +%H:%M:%S))" | tee -a "$LOG"
done
echo "campaign_r5s FINISHED $(date +%H:%M:%S)" | tee -a "$LOG"
rm -f "$PIDFILE"
