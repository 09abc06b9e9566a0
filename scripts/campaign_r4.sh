#!/bin/bash
# Round-4 recovery campaign (single TPU process, strictly sequential),
# ordered by priority in case the tunnel window is short:
#   1. bench.py        — verify the timing-body fixes end-to-end (headline)
#   2. trsm_flops      — died in the 19:30 outage (exit=124)
#   3. trsv_error      — died in the 19:30 outage (exit=1)
#   4. probe_r4b       — TRSV leaf-size at BLOCK_VEC=1024 (possible +% adopt)
#   5. probe_r4a       — f8 GEMV formulations (VERDICT #4: 1348 -> >=1400)
#   6. probe_r4c       — ragged bf16 DOT route (new) vs pad fallback
#   7. trsv_flops      — refresh after narrow-storage routing fixes
#   8. probe_r3n       — HIGHEST wide-panel fast path re-measure
#   9. trsv_flops_dense, probe_r3l — the long tails
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONFAULTHANDLER=1
LOG=bench_results/campaign_r4.log
echo "campaign_r4 start $(date +%H:%M:%S)" | tee -a "$LOG"

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

timeout 2400 python bench.py > /tmp/bench_verify.out 2> /tmp/bench_verify.err
echo "bench.py exit=$? $(date +%H:%M:%S)" | tee -a "$LOG"

run trsm_flops 3600 python -m accblas_tpu.bench.trsv_benchmark --size 16384 --nrhs 128
run trsv_error 2400 python -m accblas_tpu.bench.trsv_benchmark --size 24576 --error --no-unit

probe probe_r4b 2400
probe probe_r4a 2400
probe probe_r4c 1200
probe probe_r4d 1800

run trsv_flops 1800 python -m accblas_tpu.bench.trsv_benchmark --size 24576
probe probe_r3n 1800

# refreshes for the round-4 driver additions (identity-accessor columns in
# DOT/GEMV, cold-solve columns in TRSV — already captured by the trsv_flops
# rerun above) and the two error endpoints VERDICT r3 flags
run dot_flops 3600 python -m accblas_tpu.bench.dot_benchmark --sweep pow2 --size $((2**29))
run gemv_flops 3600 python -m accblas_tpu.bench.gemv_benchmark --sweep pow2 --size 24576
run gemv_error 3600 python -m accblas_tpu.bench.gemv_benchmark --error --sweep pow2 --size 24576
run dot_error 5400 python -m accblas_tpu.bench.dot_benchmark --error --sweep pow2 --size $((2**29))

# dense step-256 sweeps (the reference's step-100 resolution class;
# VERDICT r3 #10) — ~96 grid points each, long tails
run gemv_flops_dense 7200 python -m accblas_tpu.bench.gemv_benchmark --sweep dense --step 256 --size 24576
run trsv_flops_dense 10800 python -m accblas_tpu.bench.trsv_benchmark --sweep dense --step 256 --size 24576
probe probe_r3l 2400

echo "campaign_r4 done $(date +%H:%M:%S)" | tee -a "$LOG"
