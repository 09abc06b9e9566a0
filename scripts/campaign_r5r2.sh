#!/bin/bash
# campaign_r5r2 — resume the dense TRSV refresh after the n=16512 axon
# stall (the campaign_r5r python sat ~55 min at 0% CPU waiting on a
# device callback; the known probe_r5n stall class resolved in 20-33
# min, this one did not). Uses the new --min-size resume flag: grid
# restarts at 16512 on the same 128+256k residue class, rows flushed to
# a tail CSV that integration concatenates with the 65-row prefix.
# Claims /tmp/campaign_r5r.pid so the queued campaign_r5s keeps waiting.
cd /root/repo
LOG=bench_results/campaign_r5r2.log
PIDFILE=/tmp/campaign_r5r.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
  echo "campaign_r5r(2) already running (pid $(cat "$PIDFILE"))" >&2
  exit 1
fi
echo $$ > "$PIDFILE"
echo "campaign_r5r2 START $(date +%H:%M:%S)" | tee "$LOG"
timeout -s ABRT 14400 python -m accblas_tpu.bench.trsv_benchmark \
  --sweep dense --step 256 --size 24576 --min-size 16512 \
  > bench_results/trsv_flops_dense_r5o_tail.csv 2> bench_results/trsv_flops_dense_r5o_tail.log
echo "=== trsv_flops_dense_r5o_tail exit=$? ($(date +%H:%M:%S))" | tee -a "$LOG"
echo "campaign_r5r2 FINISHED $(date +%H:%M:%S)" | tee -a "$LOG"
rm -f "$PIDFILE"
