#!/bin/bash
# queue_r5p — wait for campaign_r5o to release the TPU, then run probe_r5p.
cd /root/repo
PIDFILE=/tmp/queue_r5p.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
  echo "queue_r5p already running (pid $(cat "$PIDFILE"))" >&2
  exit 1
fi
echo $$ > "$PIDFILE"

while [ -f /tmp/campaign_r5o.pid ] && kill -0 "$(cat /tmp/campaign_r5o.pid)" 2>/dev/null; do
  sleep 60
done
echo "queue_r5p: TPU free, running probe_r5p ($(date +%H:%M:%S))"

timeout -s ABRT 3600 python scripts/probe_r5p.py \
  > bench_results/probe_r5p.log 2>&1
echo "queue_r5p: probe_r5p exit=$? ($(date +%H:%M:%S))"
