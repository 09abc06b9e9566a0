#!/bin/bash
# campaign_r5u — hardware error rows for the probe_r5p narrow multi-rhs
# blocked reroute (bf16/f8 at 1<k<32 now ride the blocked schedule;
# verify_gate3 checked route equivalence at n=2176 — this captures the
# CSV-grade error class at the figure's n=16384 band, nrhs=8/16, same
# --no-unit convention as trsm_error.csv). Expects the 16384 LU factor
# to be pre-cached host-side (scripts/pregen_lu16384.py); regenerates
# inline (~20 min host) if not. Waits for campaign_r5t.
cd /root/repo
LOG=bench_results/campaign_r5u.log
PIDFILE=/tmp/campaign_r5u.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
  echo "campaign_r5u already running (pid $(cat "$PIDFILE"))" >&2
  exit 1
fi
echo $$ > "$PIDFILE"
for P in /tmp/campaign_r5r.pid /tmp/campaign_r5s.pid /tmp/campaign_r5t.pid; do
  while [ -f "$P" ] && kill -0 "$(cat "$P")" 2>/dev/null; do
    sleep 120
  done
done
echo "campaign_r5u START $(date +%H:%M:%S)" | tee "$LOG"
for K in 8 16; do
  timeout -s ABRT 3600 python -m accblas_tpu.bench.trsv_benchmark \
    --error --sweep single --size 16384 --nrhs $K --no-unit \
    > bench_results/trsm_error_rhs$K.csv 2> bench_results/trsm_error_rhs$K.log
  echo "=== trsm_error_rhs$K exit=$? ($(date +%H:%M:%S))" | tee -a "$LOG"
done
echo "campaign_r5u FINISHED $(date +%H:%M:%S)" | tee -a "$LOG"
rm -f "$PIDFILE"
