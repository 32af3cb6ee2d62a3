#!/usr/bin/env bash
# Round-3 stage 15: third fresh-host recovery, pre-production stage.
#   1. pretrain the sentence encoder (r2 recipe, 10 epochs);
#   2. probe the IN-STEP clip fix (d95e3a4) on the exact queue-14 arm for one
#      epoch (250 iters): queue-14 take 1 NaN'd at iter 1 with optax
#      chain-clipping, and the in-step clip has not yet run on real TPU.
# The session inspects the probe log (finite losses + |g| and visible
# clipping) before launching the production arm (r3_queue14.sh take 2).
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

$WD /tmp/r3_txt_pretrain.log 900 3600 -- \
  python -m txt2vid_tpu.train.txt \
    --sentences synthetic_big/train/sent.pickle \
    --vocab synthetic_big/vocab.pickle \
    --out out/txt_pretrain_r2 --epochs 10 --seed 11
[ -f out/txt_pretrain_r2/txt_final ] || { echo "encoder pretrain failed"; exit 1; }

GC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 32, "width": 128, "height": 128, "additional_blocks": [64, 32], "fm_stride": 32, "remat": true}}'
DC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj", "discrim_down_blocks": [4, 4, 4]}}'
DATA='{"class": "txt2vid_tpu.data.packed.packed_dataset", "args": {"data": "synthetic_128x8/videos.t2vc", "num_frames": 32}}'

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

echo QUEUE15_DONE
