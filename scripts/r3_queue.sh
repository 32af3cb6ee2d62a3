#!/usr/bin/env bash
# Round-3 serial TPU queue (one process may use the TPU at a time):
#   1. gradient-penalty attention cost bench (VERDICT r2 weak #3)
#   2. bf16_nu capability run — 12k conditional iters, the gate for making
#      BENCH_NU_BF16 the bench default
#   3. caption-alignment eval of that run (vs the f32/bf16 12k arms)
#   4. FID/pixel-stat trajectory over the 128px/32f flagship checkpoints
#   5. warm-cache bench.py exactly as the driver runs it
# Usage: scripts/r3_queue.sh [pid-to-wait-for]
set -x
cd "$(dirname "$0")/.."

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

G128='{"class": "txt2vid_tpu.models.tganv2.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 32, "width": 128, "height": 128, "remat": true}}'
D128='{"class": "txt2vid_tpu.models.tganv2.MultiScaleDiscrim", "args": {"num_channels": 1}}'
DATA128='{"class": "txt2vid_tpu.data.packed.packed_dataset", "args": {"data": "synthetic_128/videos.t2vc", "num_frames": 32}}'

# --- 1. GP attention cost ---------------------------------------------------
timeout 3600 python scripts/bench_gp_attention.py > /tmp/r3_gp_bench.log 2>&1

# --- 2. bf16_nu capability run (12k iters = 60 epochs at 200 it/epoch) ------
EPOCHS=60 timeout 5400 scripts/run_r2_cond.sh \
    --bf16 --bf16_nu --seed 23 \
    --out out/r3_cond_nu --out_samples out/r3_cond_nu/samples \
    > /tmp/r3_cond_nu.log 2>&1

# --- 3. alignment eval of the bf16_nu arm -----------------------------------
NU_CKPT=$(ls -t out/r3_cond_nu/iter_* 2>/dev/null | head -1)
if [ -n "$NU_CKPT" ]; then
  timeout 1800 python -m txt2vid_tpu.eval.alignment \
      --weights "$NU_CKPT" \
      --G '{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 16}}' \
      --D '{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj"}}' \
      --sent txt2vid_tpu.models.txt.Seq2Seq \
      --vocab synthetic_big/vocab.pickle \
      --frame_sizes 8 16 32 64 --num_frames 16 --num_channels 1 \
      --k_per_class 32 --seed 5 > /tmp/r3_align_nu.log 2>&1
fi

# --- 4. FID trajectory over the flagship checkpoints ------------------------
: > /tmp/r3_fid_trajectory.jsonl
for CKPT in \
    out/r3_128px/iter_2000_* out/r3_128px/iter_8000_* out/r3_128px/iter_14000_* \
    out/r3_128px/iter_20000_* out/r3_128px/iter_26000_* out/r3_128px/iter_28000_* \
    $(ls -t out/r3_128px_lr1e4/iter_* 2>/dev/null | head -1); do
  [ -e "$CKPT" ] || continue
  echo "{\"ckpt\": \"$CKPT\"}" >> /tmp/r3_fid_trajectory.jsonl
  timeout 1800 python -m txt2vid_tpu.eval.run \
      --weights "$CKPT" --G "$G128" --D "$D128" --dont_use_sent \
      --data "$DATA128" \
      --frame_sizes 16 32 64 128 --num_frames 32 --num_channels 1 \
      --num 128 --batch_size 16 --seed 4 \
      >> /tmp/r3_fid_trajectory.jsonl 2>/tmp/r3_fid_err.log
done

# --- 5. warm-cache bench exactly as the driver runs it ----------------------
timeout 3600 python bench.py > /tmp/r3_bench_final.log 2>&1

echo QUEUE_DONE
