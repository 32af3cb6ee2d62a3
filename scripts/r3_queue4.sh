#!/usr/bin/env bash
# Round-3 stage 4: serving-path throughput on hardware (txt2vid_tpu/serve.py)
# at the bench shape (64px/16f conditional, the r3_cond_nu 12k checkpoint) and
# the flagship shape (128px/32f conditional if stage 2 produced a checkpoint,
# else the unconditional 28k one). Serial after stage 3.
# Usage: scripts/r3_queue4.sh [pid-to-wait-for]
set -x
cd "$(dirname "$0")/.."

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

S='{"class": "txt2vid_tpu.models.txt.Seq2Seq", "args": {}}'

# --- 64px conditional (bench shape), f32 and bf16 generator compute ---------
CKPT=$(ls -dt out/r3_cond_nu/iter_* 2>/dev/null | head -1)
G64='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 16}}'
D64='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj"}}'
if [ -n "$CKPT" ]; then
  timeout 2400 python -m txt2vid_tpu.serve \
      --weights "$CKPT" --G "$G64" --D "$D64" \
      --vocab synthetic_big/vocab.pickle \
      --sentences "digit 3 is moving left and right." "digit 7 is moving up and down." \
      --frame_sizes 8 16 32 64 --num_frames 16 --num_channels 1 \
      --batch_size 64 --bench 256 > /tmp/r3_serve64.log 2>&1
  timeout 2400 python -m txt2vid_tpu.serve \
      --weights "$CKPT" --G "$G64" --D "$D64" \
      --vocab synthetic_big/vocab.pickle \
      --sentences "digit 3 is moving left and right." "digit 7 is moving up and down." \
      --frame_sizes 8 16 32 64 --num_frames 16 --num_channels 1 \
      --batch_size 64 --bf16 --bench 256 > /tmp/r3_serve64_bf16.log 2>&1
fi

# --- 128px flagship shape ---------------------------------------------------
CKPT128=$(ls -dt out/r3_cond128/iter_* 2>/dev/null | head -1)
if [ -n "$CKPT128" ]; then
  GC='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 32, "width": 128, "height": 128, "remat": true}}'
  DC='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj"}}'
  timeout 2400 python -m txt2vid_tpu.serve \
      --weights "$CKPT128" --G "$GC" --D "$DC" \
      --vocab synthetic_big/vocab.pickle \
      --sentences "digit 3 is moving left and right." "digit 7 is moving up and down." \
      --frame_sizes 16 32 64 128 --num_frames 32 --num_channels 1 \
      --batch_size 16 --bf16 --bench 64 > /tmp/r3_serve128.log 2>&1
else
  CKPT128=$(ls -dt out/r3_128px/iter_28* 2>/dev/null | head -1)
  GU='{"class": "txt2vid_tpu.models.tganv2.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 32, "width": 128, "height": 128, "remat": true}}'
  DU='{"class": "txt2vid_tpu.models.tganv2.MultiScaleDiscrim", "args": {"num_channels": 1}}'
  [ -n "$CKPT128" ] && timeout 2400 python -m txt2vid_tpu.serve \
      --weights "$CKPT128" --G "$GU" --D "$DU" \
      --frame_sizes 16 32 64 128 --num_frames 32 --num_channels 1 \
      --batch_size 16 --bf16 --bench 64 > /tmp/r3_serve128.log 2>&1
fi

echo QUEUE4_DONE
