#!/usr/bin/env bash
# Round-3 stage 10: post-outage recovery, reordered from stage 9.
#   1. warm the bench compile cache FIRST (cheapest, and the driver's
#      end-of-round bench must hit a warm cache even if the tunnel wedges
#      again later);
#   2. phase B: the 3-scale fm_stride cond-128 arm (the live hypothesis for
#      128px alignment — its queue-9 crash predated the fm_stride fix);
#   3. phase A: finish the b64 arm from iter_8000;
#   4. alignment evals for both arms + final bench re-warm.
# Every TPU invocation runs under run_with_watchdog.sh (a silent log is a
# wedged transport) and training phases retry with --resume.
set -x
cd "$(dirname "$0")/.."
WD=scripts/run_with_watchdog.sh

wait_for_tpu() {
  for i in $(seq 1 12); do
    if timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
      echo "TPU reachable (attempt $i)"; return 0
    fi
    echo "TPU probe $i failed; sleeping 120s"
    sleep 120
  done
  echo "TPU never became reachable"; return 1
}

wait_for_tpu || exit 1

# ---- 1: bench cache warm (fast if already cached) ----
$WD /tmp/r3_bench_q10a.log 900 2400 -- python bench.py

# ---- 2: phase B — 3-scale (32/64/128) fm_stride arm ----
GC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 32, "width": 128, "height": 128, "additional_blocks": [64, 32], "fm_stride": 32, "remat": true}}'
DC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj", "discrim_down_blocks": [4, 4, 4]}}'
DATA='{"class": "txt2vid_tpu.data.packed.packed_dataset", "args": {"data": "synthetic_128/videos.t2vc", "num_frames": 32}}'

for attempt in 1 2 3 4; do
  $WD /tmp/r3_cond128_3scale.log 900 7200 -- \
    python -m txt2vid_tpu.train.gan \
      --G "$GC3" --D "$DC3" \
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
      --sample_batch_size 8 --device_data \
      --out out/r3_cond128_3scale --out_samples out/r3_cond128_3scale/samples
  RC=$?
  [ $RC -eq 0 ] && break
  echo "3scale train attempt $attempt exited rc=$RC; retrying after TPU re-probe"
  wait_for_tpu || exit 1
done

for IT in 8000 final; do
  if [ "$IT" = final ]; then
    CKPT=$(ls -td out/r3_cond128_3scale/iter_* 2>/dev/null | head -1)
  else
    CKPT=$(ls -d out/r3_cond128_3scale/iter_${IT}_* 2>/dev/null | head -1)
  fi
  [ -n "$CKPT" ] || continue
  $WD "/tmp/r3_align_cond128_3scale_${IT}.log" 900 1800 -- \
    python -m txt2vid_tpu.eval.alignment \
      --weights "$CKPT" --G "$GC3" --D "$DC3" \
      --sent txt2vid_tpu.models.txt.Seq2Seq \
      --vocab synthetic_big/vocab.pickle \
      --frame_sizes 32 64 128 --num_frames 32 --num_channels 1 \
      --k_per_class 32 --seed 5
done

# ---- 3: phase A — finish the b64 arm (resumes from its latest checkpoint) ----
GC='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 32, "width": 128, "height": 128, "remat": true}}'
DC='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj"}}'

for attempt in 1 2 3; do
  $WD /tmp/r3_cond128_b64.log 900 6000 -- \
    python -m txt2vid_tpu.train.gan \
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
      --sample_batch_size 8 --device_data \
      --out out/r3_cond128_b64 --out_samples out/r3_cond128_b64/samples
  RC=$?
  [ $RC -eq 0 ] && break
  echo "b64 train attempt $attempt exited rc=$RC; retrying after TPU re-probe"
  wait_for_tpu || exit 1
done

for IT in 12000 final; do
  if [ "$IT" = final ]; then
    CKPT=$(ls -td out/r3_cond128_b64/iter_* 2>/dev/null | head -1)
  else
    CKPT=$(ls -d out/r3_cond128_b64/iter_${IT}_* 2>/dev/null | head -1)
  fi
  [ -n "$CKPT" ] || continue
  $WD "/tmp/r3_align_cond128_b64_${IT}.log" 900 1800 -- \
    python -m txt2vid_tpu.eval.alignment \
      --weights "$CKPT" --G "$GC" --D "$DC" \
      --sent txt2vid_tpu.models.txt.Seq2Seq \
      --vocab synthetic_big/vocab.pickle \
      --frame_sizes 16 32 64 128 --num_frames 32 --num_channels 1 \
      --k_per_class 32 --seed 5
done

# ---- 4: final bench re-warm for the driver ----
$WD /tmp/r3_bench_q10b.log 900 2400 -- python bench.py

echo QUEUE10_DONE
