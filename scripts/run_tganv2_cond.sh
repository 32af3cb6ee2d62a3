#!/usr/bin/env bash
# Conditional TGANv2 (cf. reference scripts/run_tganv2_cond.sh): frame pyramid
# 8/16/32/64, RSGAN loss, Bi-LSTM caption conditioning.
set -e
DATA=${DATA:-config/synth.json}
ANNO=${ANNO:-./synthetic/train/sent.pickle}
VOCAB=${VOCAB:-./synthetic/vocab.pickle}
BATCH_SIZE=${BATCH_SIZE:-40}
EPOCHS=${EPOCHS:-100}
OUT=${OUT:-out/tganv2_cond}
EXTRA=${EXTRA:-}

python -m txt2vid_tpu.train.gan \
    --G txt2vid_tpu.models.tganv2_cond.MultiScaleGen \
    --D txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim \
    --sent txt2vid_tpu.models.txt.Seq2Seq \
    --data "$DATA" --anno "$ANNO" --vocab "$VOCAB" \
    --frame_sizes 8 16 32 64 --subsample_input --num_channels 3 \
    --D_loss txt2vid_tpu.gan.losses.RSGANLoss \
    --G_lr 0.0002 --D_lr 0.0002 --G_beta2 0.999 --D_beta2 0.999 \
    --batch_size "$BATCH_SIZE" --epochs "$EPOCHS" \
    --out "$OUT" --out_samples "$OUT/samples" $EXTRA
