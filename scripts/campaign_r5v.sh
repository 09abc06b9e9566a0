#!/bin/bash
# campaign_r5v — fresh-VM relaunch of the queued round-5 tail after the
# Aug-20 restart wiped /tmp pidfiles, the JIT cache, AND the LU disk
# cache (and killed the in-flight dense refresh, whose uncommitted
# 65-row prefix is lost). Reordered cheapest-first so each capture
# lands its CSV independently if the session window closes:
#   1. r5t captures: TRSM rhs narrow band at 8192 (nrhs 8/16) — LU8192
#      regenerates inline (~3 min); LU16384 pregen runs concurrently on
#      the host (the TPU driver's host thread is mostly device-waiting).
#   2. r5s captures: 16384 nrhs 8/16 (needs LU16384).
#   3. r5u captures: 16384 nrhs 8/16 ERROR rows (--no-unit, same
#      convention as trsm_error.csv).
#   4. If the round is still alive: LU24576 pregen (~1 h host) then the
#      dense TRSV refresh from scratch under the per-row watchdog.
# Strictly sequential TPU holders; every stage is timeout-bounded.
cd /root/repo
LOG=bench_results/campaign_r5v.log
PIDFILE=/tmp/campaign_r5v.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
  echo "campaign_r5v already running (pid $(cat "$PIDFILE"))" >&2
  exit 1
fi
echo $$ > "$PIDFILE"
echo "campaign_r5v START $(date +%H:%M:%S)" | tee "$LOG"

# stage 0: LU16384 pregen on the host, concurrent with stage 1
JAX_PLATFORMS=cpu nohup python scripts/pregen_lu16384.py \
  > /tmp/pregen_lu16384.out 2>&1 &
LUPID=$!
echo "lu16384 pregen pid=$LUPID" | tee -a "$LOG"

# stage 1: 8192 narrow-band rhs captures (campaign_r5t's first half)
for K in 8 16; do
  timeout -s ABRT 2400 python -m accblas_tpu.bench.trsv_benchmark \
    --sweep single --size 8192 --nrhs $K \
    > bench_results/trsm8192_rhs$K.csv 2> bench_results/trsm8192_rhs$K.log
  echo "=== trsm8192_rhs$K exit=$? ($(date +%H:%M:%S))" | tee -a "$LOG"
done

wait $LUPID
echo "=== lu16384 pregen done ($(date +%H:%M:%S))" | tee -a "$LOG"

# stage 2: 16384 narrow-band rhs captures (campaign_r5s)
for K in 8 16; do
  timeout -s ABRT 2400 python -m accblas_tpu.bench.trsv_benchmark \
    --sweep single --size 16384 --nrhs $K \
    > bench_results/trsm_rhs$K.csv 2> bench_results/trsm_rhs$K.log
  echo "=== trsm_rhs$K exit=$? ($(date +%H:%M:%S))" | tee -a "$LOG"
done

# stage 3: 16384 narrow-band error rows (campaign_r5u)
for K in 8 16; do
  timeout -s ABRT 3600 python -m accblas_tpu.bench.trsv_benchmark \
    --error --sweep single --size 16384 --nrhs $K --no-unit \
    > bench_results/trsm_error_rhs$K.csv 2> bench_results/trsm_error_rhs$K.log
  echo "=== trsm_error_rhs$K exit=$? ($(date +%H:%M:%S))" | tee -a "$LOG"
done
echo "campaign_r5v CAPTURES FINISHED $(date +%H:%M:%S)" | tee -a "$LOG"
rm -f "$PIDFILE"

# stage 4 (opportunistic): regenerate LU24576 then rerun the dense
# refresh from scratch under the watchdog (prefix lost with the VM).
JAX_PLATFORMS=cpu timeout 7200 python - <<'EOF' > /tmp/pregen_lu24576.out 2>&1
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
import scipy.linalg
from accblas_tpu.bench.trsv_benchmark import _lu_cached
lu = _lu_cached(24576, 42, scipy)
print("lu64_seed42_n24576 ready:", lu.shape, lu.dtype, file=sys.stderr)
EOF
echo "=== lu24576 pregen exit=$? ($(date +%H:%M:%S))" | tee -a "$LOG"
bash scripts/dense_tail_watchdog.sh >> "$LOG" 2>&1
echo "campaign_r5v FINISHED $(date +%H:%M:%S)" | tee -a "$LOG"
