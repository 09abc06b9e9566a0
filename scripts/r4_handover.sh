#!/bin/bash
# Handover: wait for campaign_r4's gemv_error entry to finish (don't waste
# the in-flight TPU work), then stop campaign_r4 and its chained watchers BY
# PID (pidfiles + ppid walks — never by pattern), then launch the reordered
# campaign_r4r.sh. ONE instance (pidfile /tmp/r4_handover.pid).
set -u
cd /root/repo
CLOG=bench_results/campaign_r4.log

while ! grep -q "=== gemv_error exit=" "$CLOG" 2>/dev/null; do sleep 60; done
echo "gemv_error finished; taking over $(date +%H:%M:%S)"

kill_tree() { # kill a pid and all descendants, children first
  local pid=$1
  local kids
  kids=$(ps -o pid= --ppid "$pid" 2>/dev/null)
  for k in $kids; do kill_tree "$k"; done
  kill "$pid" 2>/dev/null
}

for f in /tmp/campaign_r4.pid /tmp/post_campaign_r4.pid /tmp/campaign_r4c.pid; do
  [ -f "$f" ] || continue
  pid=$(cat "$f")
  if kill -0 "$pid" 2>/dev/null; then
    echo "killing tree of $f ($pid)"
    kill_tree "$pid"
  fi
done
sleep 5  # let the TPU client release the chip

echo "campaign_r4 superseded by campaign_r4r at $(date +%H:%M:%S)" >> "$CLOG"
nohup bash scripts/campaign_r4r.sh > /tmp/campaign_r4r.out 2>&1 &
echo $! > /tmp/campaign_r4r.pid
echo "campaign_r4r launched pid $(cat /tmp/campaign_r4r.pid)"
