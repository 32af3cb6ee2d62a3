#!/usr/bin/env bash
# Round-3 stage 2: conditional flagship — TGANv2-cond at the reference's headline
# 128px/32-frame shape, with the pretrained frozen sentence encoder and the
# device-resident packed cache (mandatory: the axon transport leaks every H2D
# byte, so a 25k-iter streaming run OOMs the host — RESULTS.md round 3).
# Conditioning + a pretrained encoder is what unlocked crisp digits at 64px;
# this run tests whether the same recipe reaches recognizable digits at the
# flagship shape. Then: caption-alignment + FID evals at 128px.
# Usage: scripts/r3_queue2.sh [pid-to-wait-for]
set -x
cd "$(dirname "$0")/.."

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

GC='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 32, "width": 128, "height": 128, "remat": true}}'
DC='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj"}}'
DATA='{"class": "txt2vid_tpu.data.packed.packed_dataset", "args": {"data": "synthetic_128/videos.t2vc", "num_frames": 32}}'

timeout 9000 python -m txt2vid_tpu.train.gan \
    --G "$GC" --D "$DC" \
    --sent txt2vid_tpu.models.txt.Seq2Seq \
    --sent_weights out/txt_pretrain_r2/txt_final \
    --data "$DATA" \
    --anno synthetic_128/train/sent.pickle \
    --vocab synthetic_big/vocab.pickle \
    --frame_sizes 16 32 64 128 --subsample_input --num_channels 1 \
    --D_loss txt2vid_tpu.gan.losses.RSGANLoss --gp_lambda 1.0 \
    --G_lr 0.0002 --D_lr 0.0002 --G_beta2 0.999 --D_beta2 0.999 \
    --batch_size 32 --epochs 400 --seed 29 \
    --log_period 100 --save_model_period 2000 --save_example_period 1000 \
    --device_data \
    --out out/r3_cond128 --out_samples out/r3_cond128/samples \
    > /tmp/r3_cond128.log 2>&1

CKPT=$(ls -t out/r3_cond128/iter_* 2>/dev/null | head -1)
if [ -n "$CKPT" ]; then
  timeout 2400 python -m txt2vid_tpu.eval.alignment \
      --weights "$CKPT" --G "$GC" --D "$DC" \
      --sent txt2vid_tpu.models.txt.Seq2Seq \
      --vocab synthetic_big/vocab.pickle \
      --frame_sizes 16 32 64 128 --num_frames 32 --num_channels 1 \
      --k_per_class 32 --seed 5 > /tmp/r3_align_cond128.log 2>&1

  timeout 2400 python -m txt2vid_tpu.eval.run \
      --weights "$CKPT" --G "$GC" --D "$DC" \
      --sent txt2vid_tpu.models.txt.Seq2Seq \
      --vocab synthetic_big/vocab.pickle \
      --data "$DATA" --anno synthetic_128/train/sent.pickle \
      --frame_sizes 16 32 64 128 --num_frames 32 --num_channels 1 \
      --num 128 --batch_size 16 --seed 4 > /tmp/r3_fid_cond128.log 2>&1
fi

echo QUEUE2_DONE
