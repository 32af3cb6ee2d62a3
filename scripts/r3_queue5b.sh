#!/usr/bin/env bash
# Round-3 stage 5b (replaces the tail of r3_queue5.sh, reordered by value):
#   1. alignment @ iter_20000 of the cond-128 flagship (completes the sweep)
#   2. RECIPE EXPERIMENT: cond-128 with 3 scales (32/64/128) instead of 4 —
#      at 128px the 16px pyramid base renders the ~28px glyph at ~3px (no
#      digit signal) and the top scale's subsampled batch is 4; dropping the
#      dead scale doubles both. 12k iters = the budget where the 64px recipe
#      already shows 65-100% alignment, then alignment eval.
#   3. warm driver bench
#   4. FIDs of the (chance-level) 4-scale checkpoints, last — lowest value
# Usage: scripts/r3_queue5b.sh [pid-to-wait-for]
set -x
cd "$(dirname "$0")/.."

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

GC='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 32, "width": 128, "height": 128, "remat": true}}'
DC='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj"}}'
DATA='{"class": "txt2vid_tpu.data.packed.packed_dataset", "args": {"data": "synthetic_128/videos.t2vc", "num_frames": 32}}'

# --- 1. alignment @ 20k (4-scale flagship) ----------------------------------
CKPT=$(ls -d out/r3_cond128/iter_20000_* 2>/dev/null | head -1)
if [ -n "$CKPT" ]; then
  timeout 2400 python -m txt2vid_tpu.eval.alignment \
      --weights "$CKPT" --G "$GC" --D "$DC" \
      --sent txt2vid_tpu.models.txt.Seq2Seq \
      --vocab synthetic_big/vocab.pickle \
      --frame_sizes 16 32 64 128 --num_frames 32 --num_channels 1 \
      --k_per_class 32 --seed 5 > /tmp/r3_align_cond128_20000.log 2>&1
fi

# --- 2. the 3-scale recipe experiment ---------------------------------------
# 12k iters at ~0.25 s/iter ≈ 50 min + compile
timeout 5400 python -m txt2vid_tpu.train.gan \
    --G "$GC" --D "$DC" \
    --sent txt2vid_tpu.models.txt.Seq2Seq \
    --sent_weights out/txt_pretrain_r2/txt_final \
    --data "$DATA" \
    --anno synthetic_128/train/sent.pickle \
    --vocab synthetic_big/vocab.pickle \
    --frame_sizes 32 64 128 --subsample_input --num_channels 1 \
    --D_loss txt2vid_tpu.gan.losses.RSGANLoss --gp_lambda 1.0 \
    --G_lr 0.0002 --D_lr 0.0002 --G_beta2 0.999 --D_beta2 0.999 \
    --batch_size 32 --epochs 194 --seed 31 \
    --log_period 100 --save_model_period 2000 --save_example_period 2000 \
    --device_data \
    --out out/r3_cond128_3scale --out_samples out/r3_cond128_3scale/samples \
    > /tmp/r3_cond128_3scale.log 2>&1

CKPT3=$(ls -td out/r3_cond128_3scale/iter_* 2>/dev/null | head -1)
if [ -n "$CKPT3" ]; then
  timeout 2400 python -m txt2vid_tpu.eval.alignment \
      --weights "$CKPT3" --G "$GC" --D "$DC" \
      --sent txt2vid_tpu.models.txt.Seq2Seq \
      --vocab synthetic_big/vocab.pickle \
      --frame_sizes 32 64 128 --num_frames 32 --num_channels 1 \
      --k_per_class 32 --seed 5 > /tmp/r3_align_cond128_3scale.log 2>&1
fi

# --- 3. warm driver bench ---------------------------------------------------
timeout 3600 python bench.py > /tmp/r3_bench_final3.log 2>&1

# --- 4. FIDs of the 4-scale checkpoints (lowest value, last) ----------------
for IT in 12000 16000; do
  CKPT=$(ls -d out/r3_cond128/iter_${IT}_* 2>/dev/null | head -1)
  [ -n "$CKPT" ] || continue
  timeout 2400 python -m txt2vid_tpu.eval.run \
      --weights "$CKPT" --G "$GC" --D "$DC" \
      --sent txt2vid_tpu.models.txt.Seq2Seq \
      --vocab synthetic_big/vocab.pickle \
      --data "$DATA" --anno synthetic_128/train/sent.pickle \
      --frame_sizes 16 32 64 128 --num_frames 32 --num_channels 1 \
      --num 128 --batch_size 16 --seed 4 > /tmp/r3_fid_cond128_${IT}.log 2>&1
done

echo QUEUE5B_DONE
