#!/bin/bash
# dense_tail_watchdog — finish the dense TRSV refresh tail under a
# per-row watchdog: the axon backend wedged twice this morning (0% CPU,
# no device callback; n=16512 after 65 rows, then n=17024 after 2 tail
# rows), so a single long invocation cannot be trusted to finish. Each
# driver run resumes from the first missing size (--min-size, feac0fd);
# if no CSV row lands for ROW_TIMEOUT seconds the python is SIGABRTed
# (PYTHONFAULTHANDLER=1 dumps the wedged stack into the part log) and a
# fresh process resumes. Parts land in trsv_flops_dense_r5o_tail$i.csv;
# integration concatenates prefix + parts (dropping repeated headers).
# Claims /tmp/campaign_r5r.pid so the queued campaign_r5s keeps waiting.
cd /root/repo
LOG=bench_results/dense_tail_watchdog.log
PIDFILE=/tmp/campaign_r5r.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
  echo "campaign_r5r holder already running (pid $(cat "$PIDFILE"))" >&2
  exit 1
fi
echo $$ > "$PIDFILE"
export PYTHONFAULTHANDLER=1
STEP=256
END=24576
ROW_TIMEOUT=900  # > the ~10 min legit startup (2.4 GB upload + first compiles)
echo "dense_tail_watchdog START $(date +%H:%M:%S)" | tee -a "$LOG"

last_done() { # max n across prefix + all tail parts
  awk -F';' '$1 ~ /^[0-9]+$/ && $1 > m { m = $1 } END { print m+0 }' \
    bench_results/trsv_flops_dense_r5o.csv \
    bench_results/trsv_flops_dense_r5o_tail*.csv 2>/dev/null
}

PART=0
for ATTEMPT in $(seq 1 40); do
  LAST=$(last_done)
  if [ "$LAST" -ge "$END" ]; then
    echo "tail complete at n=$LAST ($(date +%H:%M:%S))" | tee -a "$LOG"
    break
  fi
  NEXT=$((LAST + STEP))
  PART=$((PART + 1))
  CSV=bench_results/trsv_flops_dense_r5o_tail$PART.csv
  PLOG=bench_results/trsv_flops_dense_r5o_tail$PART.log
  echo "part $PART: resume at n=$NEXT ($(date +%H:%M:%S))" | tee -a "$LOG"
  python -m accblas_tpu.bench.trsv_benchmark \
    --sweep dense --step $STEP --size $END --min-size $NEXT \
    > "$CSV" 2> "$PLOG" &
  PY=$!
  while kill -0 $PY 2>/dev/null; do
    sleep 60
    AGE=$(( $(date +%s) - $(stat -c %Y "$CSV" 2>/dev/null || date +%s) ))
    # startup grace: no row yet counts from launch via the CSV's create
    if [ "$AGE" -gt "$ROW_TIMEOUT" ]; then
      echo "part $PART wedged (no row for ${AGE}s) — SIGABRT py=$PY ($(date +%H:%M:%S))" | tee -a "$LOG"
      kill -ABRT $PY 2>/dev/null
      sleep 20
      kill -9 $PY 2>/dev/null
      break
    fi
  done
  wait $PY 2>/dev/null
  echo "part $PART exit=$? last=$(last_done) ($(date +%H:%M:%S))" | tee -a "$LOG"
done
echo "dense_tail_watchdog FINISHED last=$(last_done) ($(date +%H:%M:%S))" | tee -a "$LOG"
rm -f "$PIDFILE"
