#!/bin/bash
# Reordered round-4 campaign (supersedes the campaign_r4 tail + the
# post_campaign_r4 / campaign_r4c chains, which are killed by PID at
# handover — scripts/r4_handover.sh). Priority: the two open VERDICT items
# (trsv_error = #4a evidence on the shipped refined route; probe_r4g_hw =
# the routing decision; probe_r4e = #5) before the dense-sweep long tails,
# so a wall-clock cutoff costs the least-important captures.
# ONE instance only (pidfile /tmp/campaign_r4r.pid; kill by PID, never by
# pattern).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONFAULTHANDLER=1
LOG=bench_results/campaign_r4r.log
echo "campaign_r4r start $(date +%H:%M:%S)" | tee -a "$LOG"

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

run trsv_error 7200 python -m accblas_tpu.bench.trsv_benchmark --size 24576 --error --no-unit
probe probe_r4g_hw 3600
probe probe_r4e 2400
run dot_error 5400 python -m accblas_tpu.bench.dot_benchmark --error --sweep pow2 --size $((2**29))

# headline + details refresh with LEAF_VEC=256 in effect
timeout 2400 python bench.py > /tmp/bench_verify2.out 2> /tmp/bench_verify2.err
echo "bench.py exit=$? $(date +%H:%M:%S)" | tee -a "$LOG"

# injection point: adoption re-captures (e.g. a TRSV rerouting decided from
# probe_r4g_hw) can be dropped in as /tmp/r4_extra.sh without touching this
# running script
if [ -x /tmp/r4_extra.sh ]; then
  echo "=== r4_extra ($(date +%H:%M:%S))" | tee -a "$LOG"
  bash /tmp/r4_extra.sh >> "$LOG" 2>&1
  echo "=== r4_extra done ($(date +%H:%M:%S))" | tee -a "$LOG"
fi

run gemv_flops_dense 7200 python -m accblas_tpu.bench.gemv_benchmark --sweep dense --step 256 --size 24576
run trsv_flops_dense 10800 python -m accblas_tpu.bench.trsv_benchmark --sweep dense --step 256 --size 24576
probe probe_r3l 2400

if [ -x /tmp/r4_extra2.sh ]; then
  echo "=== r4_extra2 ($(date +%H:%M:%S))" | tee -a "$LOG"
  bash /tmp/r4_extra2.sh >> "$LOG" 2>&1
  echo "=== r4_extra2 done ($(date +%H:%M:%S))" | tee -a "$LOG"
fi

echo "CAMPAIGN_R4R FINISHED $(date +%H:%M:%S)" | tee -a "$LOG"
