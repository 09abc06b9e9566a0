#!/bin/bash
# Fix-up chain after post_campaign_r4: the Aug-18 VM re-image wiped the
# persistent JIT compile cache (~/.cache/accblas_jit survived only as the
# freshly rebuilt .npy LU files), so campaign_r4's calibrated timeouts meet
# cold-compile churn — trsv_error alone spent 18 min rebuilding the 24576 LU
# and still had ~63 cold (size x entry) compiles ahead when timeout(2400)
# fired. This chain waits for POST_CAMPAIGN_R4 FINISHED, reruns every
# campaign_r4 entry whose LAST exit was nonzero (the persistent cache keeps
# whatever the failed attempt compiled, so reruns converge), then refreshes
# BENCH_DETAILS.json so the committed details include the adopted LEAF_VEC.
# ONE instance only (pidfile /tmp/campaign_r4c.pid; kill by PID, never by
# pattern).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONFAULTHANDLER=1
LOG=bench_results/campaign_r4c.log
CLOG=bench_results/campaign_r4.log
PLOG=bench_results/post_campaign_r4.log

while ! grep -q "POST_CAMPAIGN_R4 FINISHED" "$PLOG" 2>/dev/null; do sleep 120; done
echo "campaign_r4c start $(date +%H:%M:%S)" | tee -a "$LOG"

run() { # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$LOG"
  timeout -s ABRT "$tmo" "$@" > "bench_results/$name.csv.tmp" 2> "bench_results/$name.log"
  local rc=$?
  echo "=== $name exit=$rc ($(date +%H:%M:%S))" | tee -a "$LOG"
  if [ $rc -eq 0 ]; then mv "bench_results/$name.csv.tmp" "bench_results/$name.csv"; fi
  return $rc
}

# last exit status per entry name in campaign_r4.log ("=== name exit=N (..)")
last_exit() {
  awk -v n="$1" '$0 ~ "^=== " n " exit=" { sub(/.*exit=/, ""); sub(/ .*/, ""); v=$0 } END { print (v == "" ? "missing" : v) }' "$CLOG"
}

needs_rerun() {
  local rc
  rc=$(last_exit "$1")
  [ "$rc" != 0 ]
}

# trsv_error is known-dead (exit 124); double timeouts everywhere — reruns
# start from a warm LU + partially-warm JIT cache
needs_rerun trsv_error && run trsv_error 10800 python -m accblas_tpu.bench.trsv_benchmark --size 24576 --error --no-unit
needs_rerun trsv_flops && run trsv_flops 5400 python -m accblas_tpu.bench.trsv_benchmark --size 24576
needs_rerun dot_flops && run dot_flops 5400 python -m accblas_tpu.bench.dot_benchmark --sweep pow2 --size $((2**29))
needs_rerun gemv_flops && run gemv_flops 5400 python -m accblas_tpu.bench.gemv_benchmark --sweep pow2 --size 24576
needs_rerun gemv_error && run gemv_error 7200 python -m accblas_tpu.bench.gemv_benchmark --error --sweep pow2 --size 24576
needs_rerun dot_error && run dot_error 10800 python -m accblas_tpu.bench.dot_benchmark --error --sweep pow2 --size $((2**29))
needs_rerun gemv_flops_dense && run gemv_flops_dense 10800 python -m accblas_tpu.bench.gemv_benchmark --sweep dense --step 256 --size 24576
needs_rerun trsv_flops_dense && run trsv_flops_dense 14400 python -m accblas_tpu.bench.trsv_benchmark --sweep dense --step 256 --size 24576

# refresh the committed details/headline with LEAF_VEC=256 in effect
timeout 2400 python bench.py > /tmp/bench_verify2.out 2> /tmp/bench_verify2.err
echo "bench.py exit=$? $(date +%H:%M:%S)" | tee -a "$LOG"

echo "CAMPAIGN_R4C FINISHED $(date +%H:%M:%S)" | tee -a "$LOG"
