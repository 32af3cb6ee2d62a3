#!/usr/bin/env bash
# Unconditional TGANv2 (cf. reference scripts/run_tganv2.sh): 16/32/64/128 pyramid,
# RSGAN + GP(0.5), subsampled input, 1:1 steps, batch 128.
set -e
DATA=${DATA:-config/mrvdc.json}
BATCH_SIZE=${BATCH_SIZE:-128}
EPOCHS=${EPOCHS:-100}
OUT=${OUT:-out/tganv2}
EXTRA=${EXTRA:-}

python -m txt2vid_tpu.train.gan \
    --G '{"class": "txt2vid_tpu.models.tganv2.MultiScaleGen", "args": {"width": 128, "height": 128}}' \
    --D txt2vid_tpu.models.tganv2.MultiScaleDiscrim \
    --dont_use_sent \
    --data "$DATA" \
    --frame_sizes 16 32 64 128 --subsample_input --num_channels 3 \
    --D_loss txt2vid_tpu.gan.losses.RSGANLoss --gp_lambda 0.5 \
    --G_lr 0.0002 --D_lr 0.0002 --G_beta2 0.999 --D_beta2 0.999 \
    --batch_size "$BATCH_SIZE" --epochs "$EPOCHS" \
    --out "$OUT" --out_samples "$OUT/samples" $EXTRA
