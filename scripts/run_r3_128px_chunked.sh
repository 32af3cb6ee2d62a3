#!/usr/bin/env bash
# Chunked driver for the 128px/32f flagship run (reference headline shape,
# thesis.tex:552: 28k iters). The axon PJRT plugin leaks every H2D byte on the
# host (~16.7 MB/batch at this shape, measured: scripts/../RESULTS.md r3), so a
# single 28k-iter process OOMs at ~7.5k iters. Epoch-bounded chunks exit
# cleanly (the trainer writes a final checkpoint) and --resume continues; the
# per-chunk seed reshuffles the data order while z stays keyed by step.
set -e
cd "$(dirname "$0")/.."
CHUNKS=${CHUNKS:-4}
for chunk in $(seq 1 "$CHUNKS"); do
  echo "=== chunk $chunk/$CHUNKS ==="
  EPOCHS=${CHUNK_EPOCHS:-90} BATCH_SIZE=${BATCH_SIZE:-32} \
    bash scripts/run_r2_128px.sh --gp_lambda 1.0 --resume \
    --seed $((3 + chunk)) \
    --out out/r3_128px --out_samples out/r3_128px/samples \
    --save_model_period 2000 --save_example_period 1000 --log_period 100 \
    --workers 6 --prefetch 4 "$@"
done
