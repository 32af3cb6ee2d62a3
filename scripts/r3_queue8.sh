#!/usr/bin/env bash
# Round-3 stage 8: the 3-scale cond-128 arm (32/64/128), expressible via the
# new MultiScaleGen fm_stride knob (models/tganv2.py): fm_stride=32 puts the
# pyramid base at 32px, where the ~28px digit glyph renders at ~7px — testing
# the leading hypothesis for the 128px alignment null result (RESULTS.md:
# the reference-structural 16px base renders the glyph at ~3px, giving the
# lowest conditional head no digit signal). Batch 32 isolates the
# base-resolution factor from queue 7's batch factor. Epoch-bounded for a
# clean resumable exit, then alignment on two checkpoints, then a warm bench
# re-run for the driver.
# Usage: scripts/r3_queue8.sh [pid-to-wait-for]
set -x
cd "$(dirname "$0")/.."

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

GC='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 32, "width": 128, "height": 128, "additional_blocks": [64, 32], "fm_stride": 32, "remat": true}}'
DC='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj", "discrim_down_blocks": [4, 4, 4]}}'
DATA='{"class": "txt2vid_tpu.data.packed.packed_dataset", "args": {"data": "synthetic_128/videos.t2vc", "num_frames": 32}}'

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
    --batch_size 32 --epochs 240 --seed 41 --resume \
    --log_period 100 --save_model_period 2000 --save_example_period 2000 \
    --sample_batch_size 8 \
    --device_data \
    --out out/r3_cond128_3scale --out_samples out/r3_cond128_3scale/samples \
    > /tmp/r3_cond128_3scale.log 2>&1

for IT in 8000 final; do
  if [ "$IT" = final ]; then
    CKPT=$(ls -td out/r3_cond128_3scale/iter_* 2>/dev/null | head -1)
  else
    CKPT=$(ls -d out/r3_cond128_3scale/iter_${IT}_* 2>/dev/null | head -1)
  fi
  [ -n "$CKPT" ] || continue
  timeout 1800 python -m txt2vid_tpu.eval.alignment \
      --weights "$CKPT" --G "$GC" --D "$DC" \
      --sent txt2vid_tpu.models.txt.Seq2Seq \
      --vocab synthetic_big/vocab.pickle \
      --frame_sizes 32 64 128 --num_frames 32 --num_channels 1 \
      --k_per_class 32 --seed 5 > "/tmp/r3_align_cond128_3scale_${IT}.log" 2>&1
done

timeout 1800 python bench.py > /tmp/r3_bench_final2.log 2>&1

echo QUEUE8_DONE
