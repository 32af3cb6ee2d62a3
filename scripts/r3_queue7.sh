#!/usr/bin/env bash
# Round-3 stage 7: resume the cond-128 batch-64 arm (queue 6 OOMed at iter
# 2000 while SAMPLING: the eval-path generator renders the full batch with no
# pyramid batch-halving, so batch 64 at 128px needs ~8x a train step's
# activation memory -- fixed here with --sample_batch_size 8). Epoch-bounded
# to ~15.5k total iters (epochs are derived from the restored step, so
# --epochs is a TOTAL bound), then the alignment sweep over three
# checkpoints, then a warm bench re-run so the driver's final bench hits a
# warm compile cache.
# Usage: scripts/r3_queue7.sh [pid-to-wait-for]
set -x
cd "$(dirname "$0")/.."

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

GC='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 32, "width": 128, "height": 128, "remat": true}}'
DC='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj"}}'
DATA='{"class": "txt2vid_tpu.data.packed.packed_dataset", "args": {"data": "synthetic_128/videos.t2vc", "num_frames": 32}}'

timeout 8400 python -m txt2vid_tpu.train.gan \
    --G "$GC" --D "$DC" \
    --sent txt2vid_tpu.models.txt.Seq2Seq \
    --sent_weights out/txt_pretrain_r2/txt_final \
    --data "$DATA" \
    --anno synthetic_128/train/sent.pickle \
    --vocab synthetic_big/vocab.pickle \
    --frame_sizes 16 32 64 128 --subsample_input --num_channels 1 \
    --D_loss txt2vid_tpu.gan.losses.RSGANLoss --gp_lambda 1.0 \
    --G_lr 0.0002 --D_lr 0.0002 --G_beta2 0.999 --D_beta2 0.999 \
    --batch_size 64 --epochs 500 --seed 37 --resume \
    --log_period 100 --save_model_period 1000 --save_example_period 2000 \
    --sample_batch_size 8 \
    --device_data \
    --out out/r3_cond128_b64 --out_samples out/r3_cond128_b64/samples \
    > /tmp/r3_cond128_b64.log 2>&1

for IT in 8000 12000 final; do
  if [ "$IT" = final ]; then
    CKPT=$(ls -td out/r3_cond128_b64/iter_* 2>/dev/null | head -1)
  else
    CKPT=$(ls -d out/r3_cond128_b64/iter_${IT}_* 2>/dev/null | head -1)
  fi
  [ -n "$CKPT" ] || continue
  timeout 1800 python -m txt2vid_tpu.eval.alignment \
      --weights "$CKPT" --G "$GC" --D "$DC" \
      --sent txt2vid_tpu.models.txt.Seq2Seq \
      --vocab synthetic_big/vocab.pickle \
      --frame_sizes 16 32 64 128 --num_frames 32 --num_channels 1 \
      --k_per_class 32 --seed 5 > "/tmp/r3_align_cond128_b64_${IT}.log" 2>&1
done

# warm the bench compile cache for the driver's end-of-round bench
timeout 1800 python bench.py > /tmp/r3_bench_final.log 2>&1

echo QUEUE7_DONE
