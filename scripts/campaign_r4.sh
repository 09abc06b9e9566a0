#!/bin/bash
# Round-4 recovery campaign (single TPU process, strictly sequential):
#   1. bench.py           — verify the timing-body fixes end-to-end (headline)
#   2. campaign_r3m.sh    — the queued re-measurements (TRSV/TRSM CSVs stale
#                           after the narrow-storage routing fixes; trsm_flops
#                           and trsv_error died in the 19:30 outage) + r3l/r3n
#   3. probe_r4a          — f8 GEMV formulations beyond the kcols=8 embed
#   4. probe_r4b          — TRSV leaf-size at BLOCK_VEC=1024
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONFAULTHANDLER=1
LOG=bench_results/campaign_r4.log
echo "campaign_r4 start $(date +%H:%M:%S)" | tee -a "$LOG"

timeout 2400 python bench.py > /tmp/bench_verify.out 2> /tmp/bench_verify.err
echo "bench.py exit=$? $(date +%H:%M:%S)" | tee -a "$LOG"

bash scripts/campaign_r3m.sh
echo "r3m done $(date +%H:%M:%S)" | tee -a "$LOG"

timeout 2400 python scripts/probe_r4a.py > bench_results/probe_r4a.log 2>&1
echo "probe_r4a exit=$? $(date +%H:%M:%S)" | tee -a "$LOG"
timeout 2400 python scripts/probe_r4b.py > bench_results/probe_r4b.log 2>&1
echo "probe_r4b exit=$? $(date +%H:%M:%S)" | tee -a "$LOG"
timeout 1200 python scripts/probe_r4c.py > bench_results/probe_r4c.log 2>&1
echo "probe_r4c exit=$? $(date +%H:%M:%S)" | tee -a "$LOG"
echo "campaign_r4 done $(date +%H:%M:%S)" | tee -a "$LOG"
