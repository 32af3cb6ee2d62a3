#!/usr/bin/env bash
# Round-3 stage 6: cond-128 batch-64 arm — tests the pyramid-batch hypothesis
# for the 128px alignment null result (RESULTS.md): doubling global batch
# doubles every scale's conditional batch (top scale 4 -> 8). Bounded to ~80
# min of train, then alignment on the latest checkpoint; the trainer writes a
# final checkpoint on exit so a following round can --resume.
# Usage: scripts/r3_queue6.sh [pid-to-wait-for]
set -x
cd "$(dirname "$0")/.."

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

GC='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 32, "width": 128, "height": 128, "remat": true}}'
DC='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj"}}'
DATA='{"class": "txt2vid_tpu.data.packed.packed_dataset", "args": {"data": "synthetic_128/videos.t2vc", "num_frames": 32}}'

timeout 4800 python -m txt2vid_tpu.train.gan \
    --G "$GC" --D "$DC" \
    --sent txt2vid_tpu.models.txt.Seq2Seq \
    --sent_weights out/txt_pretrain_r2/txt_final \
    --data "$DATA" \
    --anno synthetic_128/train/sent.pickle \
    --vocab synthetic_big/vocab.pickle \
    --frame_sizes 16 32 64 128 --subsample_input --num_channels 1 \
    --D_loss txt2vid_tpu.gan.losses.RSGANLoss --gp_lambda 1.0 \
    --G_lr 0.0002 --D_lr 0.0002 --G_beta2 0.999 --D_beta2 0.999 \
    --batch_size 64 --epochs 400 --seed 31 --resume \
    --log_period 100 --save_model_period 1000 --save_example_period 2000 \
    --device_data \
    --out out/r3_cond128_b64 --out_samples out/r3_cond128_b64/samples \
    > /tmp/r3_cond128_b64.log 2>&1

CKPT=$(ls -td out/r3_cond128_b64/iter_* 2>/dev/null | head -1)
if [ -n "$CKPT" ]; then
  timeout 1800 python -m txt2vid_tpu.eval.alignment \
      --weights "$CKPT" --G "$GC" --D "$DC" \
      --sent txt2vid_tpu.models.txt.Seq2Seq \
      --vocab synthetic_big/vocab.pickle \
      --frame_sizes 16 32 64 128 --num_frames 32 --num_channels 1 \
      --k_per_class 32 --seed 5 > /tmp/r3_align_cond128_b64.log 2>&1
fi

echo QUEUE6_DONE
