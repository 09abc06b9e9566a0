#!/bin/bash
# Round-5 CPU-side track (no TPU contention — runs alongside campaign_r5b):
#   1. pcg convergence table on the 8-device CPU mesh (round-4 VERDICT #1;
#      the round-4 capture died after 1 of 4 variants, emitter now kill-safe
#      per variant) — opt level 0 pinned so CPU df64 EFTs stay exact.
#   2. regen_lu_cache.py — the reboot wiped ~/.cache; the TRSV/TRSM entries
#      in campaign_r5b part 3 need the 24576 fp64 LU (~1 h on this 1-core
#      host).
set -u
cd /root/repo
# CPU only: drop the axon sitecustomize (or the CLI hangs initializing the
# tunnel) and force the cpu platform both ways.
export PYTHONPATH=/root/repo
export JAX_PLATFORMS=cpu
export XLA_FLAGS="--xla_force_host_platform_device_count=8 --xla_backend_optimization_level=0"
PIDFILE=/tmp/campaign_r5cpu.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
  echo "campaign_r5cpu already running (pid $(cat "$PIDFILE")); exiting" >&2
  exit 1
fi
echo $$ > "$PIDFILE"
LOG=bench_results/campaign_r5cpu.log
echo "campaign_r5cpu start $(date +%H:%M:%S)" | tee -a "$LOG"

echo "=== pcg_convergence ($(date +%H:%M:%S))" | tee -a "$LOG"
timeout 7200 python -m accblas_tpu.bench.solvers_benchmark --pcg --size 4096 \
  > bench_results/pcg_convergence.csv.tmp 2> bench_results/pcg_convergence.log
rc=$?
echo "=== pcg_convergence exit=$rc ($(date +%H:%M:%S))" | tee -a "$LOG"
if [ $rc -eq 0 ]; then
  mv bench_results/pcg_convergence.csv.tmp bench_results/pcg_convergence.csv
fi

echo "=== regen_lu_cache ($(date +%H:%M:%S))" | tee -a "$LOG"
timeout 10800 python scripts/regen_lu_cache.py >> "$LOG" 2>&1
echo "=== regen_lu_cache exit=$? ($(date +%H:%M:%S))" | tee -a "$LOG"

echo "campaign_r5cpu FINISHED $(date +%H:%M:%S)" | tee -a "$LOG"
