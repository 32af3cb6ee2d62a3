#!/usr/bin/env bash
# Round-3 stage 16: fourth fresh-host recovery, fully chained.
# The host reset (again) wiped /tmp, out/ and the datasets mid-queue-15.
# This stage runs the whole recovery unattended:
#   1. regenerate datasets (CPU, scripts/r3_regen_data.sh)
#   2. pretrain the sentence encoder (r2 recipe, 10 epochs)
#   3. probe the IN-STEP clip fix (d95e3a4) on the exact queue-14 arm for one
#      epoch (250 iters) — queue-14 take 1 NaN'd at iter 1 with optax
#      chain-clipping; the in-step clip has not yet run on real TPU
#   4. AUTO-check the probe log (all logged losses finite, >=15 log lines)
#   5. launch the production arm (scripts/r3_queue14.sh) with the remaining
#      wall-clock budget, reserving time for alignment evals + bench warm
set -x
cd "$(dirname "$0")/.."
WD=scripts/run_with_watchdog.sh

# Round end (hard): leave the driver a clean margin.
ROUND_END=${ROUND_END:-$(( $(date +%s) + 39600 ))}   # default: now + 11h

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

# ---- 1. datasets (CPU-only; skip what already exists) ----
if [ ! -f synthetic_128x8/videos.t2vc ] || [ ! -f synthetic_big/vocab.pickle ]; then
  bash scripts/r3_regen_data.sh > /tmp/r3_regen.log 2>&1 || { echo "REGEN FAILED"; exit 1; }
fi

wait_for_tpu || exit 1

# ---- 2. encoder pretrain ----
if [ ! -f out/txt_pretrain_r2/txt_final ]; then
  $WD /tmp/r3_txt_pretrain.log 900 3600 -- \
    python -m txt2vid_tpu.train.txt \
      --sentences synthetic_big/train/sent.pickle \
      --vocab synthetic_big/vocab.pickle \
      --out out/txt_pretrain_r2 --epochs 10 --seed 11
  [ -f out/txt_pretrain_r2/txt_final ] || { echo "encoder pretrain failed"; exit 1; }
fi

GC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 32, "width": 128, "height": 128, "additional_blocks": [64, 32], "fm_stride": 32, "remat": true}}'
DC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj", "discrim_down_blocks": [4, 4, 4]}}'
DATA='{"class": "txt2vid_tpu.data.packed.packed_dataset", "args": {"data": "synthetic_128x8/videos.t2vc", "num_frames": 32}}'

# ---- 3. in-step clip probe (1 epoch = 250 iters) ----
wait_for_tpu || exit 1
$WD /tmp/r3_clip_probe.log 900 1800 -- \
  python -m txt2vid_tpu.train.gan \
    --G "$GC3" --D "$DC3" \
    --sent txt2vid_tpu.models.txt.Seq2Seq \
    --sent_weights out/txt_pretrain_r2/txt_final \
    --data "$DATA" \
    --anno synthetic_128x8/train/sent.pickle \
    --vocab synthetic_big/vocab.pickle \
    --frame_sizes 32 64 128 --subsample_input --num_channels 1 \
    --D_loss txt2vid_tpu.gan.losses.RSGANLoss --gp_lambda 1.0 \
    --G_lr 0.0002 --D_lr 0.0002 --G_beta2 0.999 --D_beta2 0.999 \
    --clip_grad 50 \
    --batch_size 32 --epochs 1 --seed 41 \
    --log_period 10 --save_model_period 100000 --save_example_period 100000 \
    --sample_batch_size 8 --device_data \
    --out out/r3_clip_probe --out_samples out/r3_clip_probe/samples

# ---- 4. auto-check: every logged loss finite, enough lines to trust it ----
NLINES=$(grep -c "Loss_D:" /tmp/r3_clip_probe.log || true)
NNAN=$(grep -c "Loss_D: nan\|Loss_G: nan\||g|D: nan\||g|G: nan" /tmp/r3_clip_probe.log || true)
echo "clip probe: $NLINES loss lines, $NNAN nan lines"
if [ "$NNAN" -ne 0 ] || [ "$NLINES" -lt 15 ]; then
  echo "CLIP_PROBE_FAILED (lines=$NLINES nan=$NNAN) — not launching production"
  exit 2
fi
echo CLIP_PROBE_OK

# ---- 5. production arm with the remaining budget ----
# Reserve 4500s for the alignment sweep + bench warm inside queue14.
REMAIN=$(( ROUND_END - $(date +%s) - 4500 ))
[ "$REMAIN" -lt 600 ] && { echo "no budget left for production"; exit 3; }
TRAIN_BUDGET_S=$REMAIN bash scripts/r3_queue14.sh
echo QUEUE16_DONE
