#!/bin/bash
# Round-5 CPU track, part 2 — the pcg convergence table, rescaled.
# At n=4096 the df64-matvec variants run >2 h each on this 1-core host
# under XLA:CPU opt-0 (two sessions measured it: the round-4 capture and
# today's 50-min partial) — the table's claim is CONVERGENCE PARITY of the
# sharded recurrence, which n=1024 demonstrates identically (solvers.csv:
# the same 3.6e-6 / 2.5e-2 residual floors hold at 1024). Waits for the
# campaign_r5cpu runner (LU regen) to free the core, then captures all four
# variants at n=1024; rows flush per variant (kill-safe emitter).
set -u
cd /root/repo
export PYTHONPATH=/root/repo
export JAX_PLATFORMS=cpu
export XLA_FLAGS="--xla_force_host_platform_device_count=8 --xla_backend_optimization_level=0"
PIDFILE=/tmp/campaign_r5cpu2.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
  echo "campaign_r5cpu2 already running (pid $(cat "$PIDFILE")); exiting" >&2
  exit 1
fi
echo $$ > "$PIDFILE"
LOG=bench_results/campaign_r5cpu.log

if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

echo "=== pcg_convergence_1024 ($(date +%H:%M:%S))" | tee -a "$LOG"
timeout 7200 python -m accblas_tpu.bench.solvers_benchmark --pcg --size 1024 \
  > bench_results/pcg_convergence_1024.csv.tmp 2> bench_results/pcg_convergence_1024.log
rc=$?
echo "=== pcg_convergence_1024 exit=$rc ($(date +%H:%M:%S))" | tee -a "$LOG"
if [ $rc -eq 0 ]; then
  mv bench_results/pcg_convergence_1024.csv.tmp bench_results/pcg_convergence_1024.csv
fi
echo "campaign_r5cpu2 FINISHED $(date +%H:%M:%S)" | tee -a "$LOG"
