#!/bin/bash
# Round-5 campaign, part 1 (single TPU process, strictly sequential) —
# the code-independent captures, ordered so the TRSM probe lands first
# (its findings gate the part-2 recaptures):
#   1. probe_r5a      — TRSM df64 fused-group / precision probes (VERDICT #2)
#   2. solvers sweep  — multi-row solvers.csv, n=512..16384 (VERDICT #5)
#   3. dot_flops_dense — the reference's dense DOT grid (VERDICT #4)
# Part 2 (campaign_r5b.sh) runs after probe findings are adopted:
# trsm_flops, trsv_flops, trsv_flops_dense, bench.py verify.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONFAULTHANDLER=1
PIDFILE=/tmp/campaign_r5a.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
  echo "campaign_r5a already running (pid $(cat "$PIDFILE")); exiting" >&2
  exit 1
fi
echo $$ > "$PIDFILE"
LOG=bench_results/campaign_r5a.log
echo "campaign_r5a start $(date +%H:%M:%S)" | tee -a "$LOG"

run() { # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$LOG"
  timeout -s ABRT "$tmo" "$@" > "bench_results/$name.csv.tmp" 2> "bench_results/$name.log"
  local rc=$?
  echo "=== $name exit=$rc ($(date +%H:%M:%S))" | tee -a "$LOG"
  if [ $rc -eq 0 ]; then mv "bench_results/$name.csv.tmp" "bench_results/$name.csv"; fi
  return $rc
}

probe() { # name timeout
  local name=$1 tmo=$2
  echo "=== $name ($(date +%H:%M:%S))" | tee -a "$LOG"
  timeout "$tmo" python "scripts/$name.py" > "bench_results/$name.log" 2>&1
  echo "=== $name exit=$? ($(date +%H:%M:%S))" | tee -a "$LOG"
}

probe probe_r5a 3600
run solvers 7200 python -m accblas_tpu.bench.solvers_benchmark --size 16384
run dot_flops_dense 14400 python -m accblas_tpu.bench.dot_benchmark --sweep dense --step 6000000 --size $((2**29))

echo "campaign_r5a FINISHED $(date +%H:%M:%S)" | tee -a "$LOG"
