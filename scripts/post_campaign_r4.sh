#!/bin/bash
# Post-campaign follow-ups: waits for campaign_r4.sh to finish (it owns the
# TPU until "campaign_r4 done" appears in its log), then runs the probes
# written after the campaign launched. ONE instance only (pidfile
# /tmp/post_campaign_r4.pid; kill by PID, never by pattern).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONFAULTHANDLER=1
LOG=bench_results/post_campaign_r4.log
CLOG=bench_results/campaign_r4.log

while ! grep -q "campaign_r4 done" "$CLOG" 2>/dev/null; do sleep 120; done

echo "post_campaign_r4 start $(date +%H:%M:%S)" | tee -a "$LOG"
timeout 2400 python scripts/probe_r4e.py > bench_results/probe_r4e.log 2>&1
echo "=== probe_r4e exit=$? ($(date +%H:%M:%S))" | tee -a "$LOG"
echo "POST_CAMPAIGN_R4 FINISHED" | tee -a "$LOG"
