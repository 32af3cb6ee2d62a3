#!/usr/bin/env bash
# Round-3 stage 3: measure the shared_gen_fwd byte/FLOP lever on hardware
# (one vjp'd generator forward for both phases — train_step.py shared_gen_fwd),
# alone and combined with the adopted bf16-nu lever, plus a same-session
# baseline re-run for a fair comparison triplet. Serial after stage 2 (one
# process may use the TPU at a time).
# Usage: scripts/r3_queue3.sh [pid-to-wait-for]
set -x
cd "$(dirname "$0")/.."

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

timeout 3600 python bench.py > /tmp/r3_bench_base2.log 2>&1
BENCH_SHARED_FWD=1 timeout 3600 python bench.py > /tmp/r3_bench_sharedfwd.log 2>&1
BENCH_SHARED_FWD=1 BENCH_NU_BF16=1 timeout 3600 python bench.py \
    > /tmp/r3_bench_sharedfwd_nu.log 2>&1

echo QUEUE3_DONE
