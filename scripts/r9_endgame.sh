#!/usr/bin/env bash
# End-of-round-5 chip queue, run AFTER the r9 flagship chain has released
# the chip (R9_SESSION_DONE in /tmp/r9_session*.log):
#   1. bench.py at the shipped default — REQUIRED last so the driver's
#      end-of-round bench hits a warm persistent-cache entry.
#   2. remat lever re-measure under the bf16_params default (VERDICT r4
#      task 7): the byte budget halved since the r2 rejection, the
#      compute-vs-bytes tradeoff moved.
#   3. one dstep-level arm of the clip-miscompile reproducer (VERDICT r4
#      task 4): does adding the Adam update to the finite dgrad program
#      flip it non-finite?
# Ordering note: 2 and 3 run BEFORE the final bench re-run so the last
# compiled-and-executed program of the session is the driver's bench
# program.
set -x
cd "$(dirname "$0")/.."
mkdir -p docs/r5

echo "== remat sweep under bf16_params default =="
for lever in REMAT_D REMAT_G; do
  env "BENCH_${lever}=1" timeout 900 python bench.py 2>/dev/null | tail -1 \
    | tee "docs/r5/bench_remat_${lever#REMAT_}.json"
done

echo "== dstep reproducer arm (flagship trigger shape) =="
for arm in fused off; do
  timeout 1800 python scripts/repro_clip_miscompile.py \
    --level dstep --arm "$arm" --batch 32 --frames 32 --px 128 --iters 2 \
    2>/dev/null | tail -1 | tee "docs/r5/repro_dstep_${arm}.json.log"
done

echo "== final default bench (driver cache warm) =="
timeout 900 python bench.py 2>/dev/null | tail -1 | tee docs/r5/bench_final.json
echo R9_ENDGAME_DONE
