#!/bin/bash
# Round-5 campaign, part 2 (single TPU process, strictly sequential) —
# resumes after the Aug-19 ~02:40 host reboot killed campaign_r5a mid
# dot_flops_dense (probe_r5a + solvers sweep landed; committed in 9530365):
#   1. dot_flops_dense — the reference's dense DOT grid (VERDICT #4), resumed
#   2. probe_r5b       — blocked-XLA df64 TRSM prototype (VERDICT #2);
#                        needs the LU cache campaign_r5cpu regenerates
#   3. trsv_flops_dense — bf16/f16 post-refine-gate recapture (VERDICT #3)
# Part 3 (campaign_r5c) runs after probe_r5b findings are adopted:
# trsm_flops recapture + bench.py verify.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONFAULTHANDLER=1
PIDFILE=/tmp/campaign_r5b.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
  echo "campaign_r5b already running (pid $(cat "$PIDFILE")); exiting" >&2
  exit 1
fi
echo $$ > "$PIDFILE"
LOG=bench_results/campaign_r5b.log
echo "campaign_r5b start $(date +%H:%M:%S)" | tee -a "$LOG"

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

run dot_flops_dense 14400 python -m accblas_tpu.bench.dot_benchmark --sweep dense --step 6000000 --size $((2**29))
probe probe_r5b 3600
run trsv_flops_dense 14400 python -m accblas_tpu.bench.trsv_benchmark --sweep dense --step 256 --size 24576

echo "campaign_r5b FINISHED $(date +%H:%M:%S)" | tee -a "$LOG"
