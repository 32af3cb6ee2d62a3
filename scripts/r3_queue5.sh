#!/usr/bin/env bash
# Round-3 stage 5: conditional-128px flagship checkpoint sweep — the run's D loss
# destabilized late (transient 4.5e8 spike near iter 24.7k), so the final
# checkpoint queue2 evaluates may not be the best one. Evaluate alignment (the
# capability metric) at three mid checkpoints, FID at the best two, then leave
# the driver's bench warm. Serial after stage 4.
# Usage: scripts/r3_queue5.sh [pid-to-wait-for]
set -x
cd "$(dirname "$0")/.."

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

GC='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 32, "width": 128, "height": 128, "remat": true}}'
DC='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj"}}'
DATA='{"class": "txt2vid_tpu.data.packed.packed_dataset", "args": {"data": "synthetic_128/videos.t2vc", "num_frames": 32}}'

for IT in 12000 16000 20000; do
  CKPT=$(ls -d out/r3_cond128/iter_${IT}_* 2>/dev/null | head -1)
  [ -n "$CKPT" ] || continue
  timeout 2400 python -m txt2vid_tpu.eval.alignment \
      --weights "$CKPT" --G "$GC" --D "$DC" \
      --sent txt2vid_tpu.models.txt.Seq2Seq \
      --vocab synthetic_big/vocab.pickle \
      --frame_sizes 16 32 64 128 --num_frames 32 --num_channels 1 \
      --k_per_class 32 --seed 5 > /tmp/r3_align_cond128_${IT}.log 2>&1
done

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

# leave the driver's bench path warm (current bench.py defaults)
timeout 3600 python bench.py > /tmp/r3_bench_final2.log 2>&1

echo QUEUE5_DONE
