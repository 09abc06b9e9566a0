#!/bin/bash
# campaign_r5t — finish the TRSM rhs-axis narrow band (nrhs=8/16 at
# n=8192, matching the 16384 captures campaign_r5s takes) so the rhs
# figure has the full {8,16,32,128,512} bracket at both sizes, then
# refresh BENCH_DETAILS.json (bench.py) so the committed headline
# artifact reflects the shipped round-5 routes (f8 blocked TRSV,
# narrow block retune, probe_r5p gates). Waits for campaign_r5s.
cd /root/repo
LOG=bench_results/campaign_r5t.log
PIDFILE=/tmp/campaign_r5t.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
  echo "campaign_r5t already running (pid $(cat "$PIDFILE"))" >&2
  exit 1
fi
echo $$ > "$PIDFILE"
for P in /tmp/campaign_r5r.pid /tmp/campaign_r5s.pid; do
  while [ -f "$P" ] && kill -0 "$(cat "$P")" 2>/dev/null; do
    sleep 120
  done
done
echo "campaign_r5t START $(date +%H:%M:%S)" | tee "$LOG"
for K in 8 16; do
  timeout -s ABRT 3600 python -m accblas_tpu.bench.trsv_benchmark \
    --sweep single --size 8192 --nrhs $K \
    > bench_results/trsm8192_rhs$K.csv 2> bench_results/trsm8192_rhs$K.log
  echo "=== trsm8192_rhs$K exit=$? ($(date +%H:%M:%S))" | tee -a "$LOG"
done
timeout -s ABRT 2400 python bench.py > /tmp/bench_verify_r5t.out 2> /tmp/bench_verify_r5t.err
echo "=== bench.py exit=$? ($(date +%H:%M:%S))" | tee -a "$LOG"
echo "campaign_r5t FINISHED $(date +%H:%M:%S)" | tee -a "$LOG"
rm -f "$PIDFILE"
