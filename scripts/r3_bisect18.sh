#!/usr/bin/env bash
# Round-3 stage 18: bisect the flagship |g|D NaN that survives the
# optimization-barrier fix THROUGH THE TRAINER but not in the standalone probe
# (queue-17 gate: 250/250 non-finite |g|D with clip 50; probe at b=8 finite).
# Two discriminating arms, cheapest-information-first:
#   A. trainer CLI, identical to the queue-17 probe but --clip_grad 0.
#      finite => the clip math is the trigger in the trainer program too, and
#      the clip-free trainer program is healthy at the flagship shape
#      (production can run clip-free + host-side NaN rollback).
#   B. standalone probe at the trainer's batch 32 with clip 50.
#      NaN    => batch-32 defeats the barrier regardless of the trainer
#                program (iterate formulations in probe-land, fast).
#      finite => the trigger is trainer-program-specific (device_data gather /
#                metrics stacking / real encoder).
set -x
cd "$(dirname "$0")/.."
WD=scripts/run_with_watchdog.sh

GC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 32, "width": 128, "height": 128, "additional_blocks": [64, 32], "fm_stride": 32, "remat": true}}'
DC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj", "discrim_down_blocks": [4, 4, 4]}}'
DATA='{"class": "txt2vid_tpu.data.packed.packed_dataset", "args": {"data": "synthetic_128x8/videos.t2vc", "num_frames": 32}}'

wait_for_tpu() {
  for i in $(seq 1 12); do
    if timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
      echo "TPU reachable (attempt $i)"; return 0
    fi
    echo "TPU probe $i failed; sleeping 120s"; sleep 120
  done
  echo "TPU never became reachable"; return 1
}

wait_for_tpu || exit 1

# ---- Arm A: trainer path, clip OFF ----
rm -rf out/r3_bisect_a
$WD /tmp/r3_bisect_a.log 900 2400 -- \
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
    --batch_size 32 --epochs 1 --seed 41 \
    --log_period 10 --save_model_period 100000 --save_example_period 100000 \
    --sample_batch_size 8 --device_data \
    --out out/r3_bisect_a --out_samples out/r3_bisect_a/samples
NGN_A=$(grep -c "|g|D: [0-9]" /tmp/r3_bisect_a.log || true)
NBAD_A=$(grep -c "non-finite" /tmp/r3_bisect_a.log || true)
echo "ARM_A trainer clip0: finite-gnorm-lines=$NGN_A nonfinite-lines=$NBAD_A"

# ---- Arm B: standalone probe at batch 32, clip 50 ----
wait_for_tpu || exit 1
$WD /tmp/r3_bisect_b.log 1500 2400 -- \
  python scripts/probe_gnorm_tpu.py --flagship --clip 50 --batch_size 32 --iters 6
echo "ARM_B probe b32 clip50 tail:"
tail -20 /tmp/r3_bisect_b.log

echo BISECT18_DONE
