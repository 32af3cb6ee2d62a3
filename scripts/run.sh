#!/usr/bin/env bash
# TCWYT conditional (cf. reference scripts/run.sh): 3 discriminators
# (video/frame/motion) + FrameMap sample mapping, RaLSGAN, 48px.
set -e
DATA=${DATA:-config/mrvdc.json}
ANNO=${ANNO:-./cooking_videos/annos.pickle}
VOCAB=${VOCAB:-./cooking_videos/vocab.pickle}
BATCH_SIZE=${BATCH_SIZE:-48}
EPOCHS=${EPOCHS:-100}
OUT=${OUT:-out/tcwyt}
EXTRA=${EXTRA:-}

python -m txt2vid_tpu.train.gan \
    --G txt2vid_tpu.models.tcwyt.Gen \
    --D txt2vid_tpu.models.tcwyt.VideoDiscrim \
         txt2vid_tpu.models.tcwyt.FrameDiscrim \
         txt2vid_tpu.models.tcwyt.MotionDiscrim \
    --D_names video frame motion \
    --M txt2vid_tpu.models.tcwyt.FrameMap \
    --sent txt2vid_tpu.models.txt.Seq2Seq \
    --data "$DATA" --anno "$ANNO" --vocab "$VOCAB" \
    --frame_sizes 48 --num_channels 3 \
    --D_loss txt2vid_tpu.gan.losses.RaLSGANLoss \
    --G_lr 0.0001 --D_lr 0.0001 \
    --batch_size "$BATCH_SIZE" --epochs "$EPOCHS" \
    --out "$OUT" --out_samples "$OUT/samples" $EXTRA
