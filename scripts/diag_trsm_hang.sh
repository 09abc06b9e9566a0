#!/bin/bash
# Bisect the trsm_flops hang (exit 124 at 2400s with zero sizes completed).
# Runs the driver at single small sizes with faulthandler enabled; on hang,
# timeout sends SIGABRT so faulthandler dumps all thread stacks.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONFAULTHANDLER=1
for n in 128 512; do
  echo "=== trsm n=$n k=128 single ($(date +%H:%M:%S))"
  timeout -s ABRT 420 python -m accblas_tpu.bench.trsv_benchmark \
    --size $n --nrhs 128 --sweep single 2>&1 | tail -30
  echo "=== exit=$? ($(date +%H:%M:%S))"
done
