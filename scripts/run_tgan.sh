#!/usr/bin/env bash
# Frame-level WGAN-GP (cf. reference scripts/run_tgan.sh active line): img ResNet
# pair, 5 D steps, gp_lambda 10, batch 32.
set -e
DATA=${DATA:-config/mrvdc.json}
BATCH_SIZE=${BATCH_SIZE:-32}
EPOCHS=${EPOCHS:-100}
OUT=${OUT:-out/img_wgan}
EXTRA=${EXTRA:-}

python -m txt2vid_tpu.train.gan \
    --G txt2vid_tpu.models.img.Gen \
    --D txt2vid_tpu.models.img.Discrim \
    --dont_use_sent --img_model \
    --data "$DATA" \
    --frame_sizes 64 --num_channels 3 \
    --D_loss txt2vid_tpu.gan.losses.WassersteinGanLoss \
    --discrim_steps 5 --gp_lambda 10 \
    --batch_size "$BATCH_SIZE" --epochs "$EPOCHS" \
    --out "$OUT" --out_samples "$OUT/samples" $EXTRA
