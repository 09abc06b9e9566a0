#!/bin/bash
# queue_r5q — after campaign_r5o and probe_r5p release the TPU, recapture
# the TRSV error table post block-retune (the bf16/f16 columns at n >= 4096
# now solve with BLOCK_VEC=1024 blocks; errors are storage-dominated there
# but the CSV of record must match the shipped route). Same protocol as the
# committed capture (scripts/bench_endpoints.sh:25).
cd /root/repo
PIDFILE=/tmp/queue_r5q.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
  echo "queue_r5q already running (pid $(cat "$PIDFILE"))" >&2
  exit 1
fi
echo $$ > "$PIDFILE"

for P in /tmp/campaign_r5o.pid /tmp/queue_r5p.pid; do
  while [ -f "$P" ] && kill -0 "$(cat "$P")" 2>/dev/null; do sleep 60; done
done
echo "queue_r5q: TPU free, recapturing trsv_error ($(date +%H:%M:%S))"

timeout -s ABRT 10800 python -m accblas_tpu.bench.trsv_benchmark \
  --error --sweep pow2 --size 24576 --no-unit \
  > bench_results/trsv_error_r5q.csv 2> bench_results/trsv_error_r5q.log
echo "queue_r5q: trsv_error exit=$? ($(date +%H:%M:%S))"
