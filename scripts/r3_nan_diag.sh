#!/usr/bin/env bash
# NaN diagnosis for the 3-scale cond-128 arm. The production run (queue-13)
# NaN'd deterministically: healthy through iter ~900 (D 0.50-0.68), D-loss
# spike 12.5 at iter 950, NaN by iter 1000 (seed 41; the ~370-iter queue-12
# probe window was simply too short). Two phases:
#   1. full-speed rerun to iter 930 checkpointing every 300 iters
#      (--host_snapshot: the first attempt OOM'd HBM in a concurrent
#      device-snapshot checkpoint save at this near-capacity shape);
#   2. resume from iter_900 with --debug_nans (donation auto-disabled,
#      parallel/mesh.py:_donate) so the eager replay pinpoints the first
#      NaN-producing primitive.
set -x
cd "$(dirname "$0")/.."
WD=scripts/run_with_watchdog.sh

GC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 32, "width": 128, "height": 128, "additional_blocks": [64, 32], "fm_stride": 32, "remat": true}}'
DC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj", "discrim_down_blocks": [4, 4, 4]}}'
DATA='{"class": "txt2vid_tpu.data.packed.packed_dataset", "args": {"data": "synthetic_128/videos.t2vc", "num_frames": 32}}'

COMMON=(python -m txt2vid_tpu.train.gan
  --G "$GC3" --D "$DC3"
  --sent txt2vid_tpu.models.txt.Seq2Seq
  --sent_weights out/txt_pretrain_r2/txt_final
  --data "$DATA"
  --anno synthetic_128/train/sent.pickle
  --vocab synthetic_big/vocab.pickle
  --frame_sizes 32 64 128 --subsample_input --num_channels 1
  --D_loss txt2vid_tpu.gan.losses.RSGANLoss --gp_lambda 1.0
  --G_lr 0.0002 --D_lr 0.0002 --G_beta2 0.999 --D_beta2 0.999
  --batch_size 32 --seed 41
  --log_period 25 --save_example_period 100000
  --sample_batch_size 4 --device_data --host_snapshot)

$WD /tmp/r3_nandiag_p1.log 900 2400 -- \
  "${COMMON[@]}" --epochs 15 --save_model_period 300 \
  --out /tmp/nandiag --out_samples /tmp/nandiag/samples

CKPT=$(ls -d /tmp/nandiag/iter_900_* 2>/dev/null | head -1)
[ -n "$CKPT" ] || { echo "no iter_900 checkpoint"; exit 1; }

$WD /tmp/r3_nandiag_p2.log 2400 7200 -- \
  "${COMMON[@]}" --epochs 17 --save_model_period 100000 \
  --weights "$CKPT" --debug_nans \
  --out /tmp/nandiag_p2 --out_samples /tmp/nandiag_p2/samples

echo NANDIAG_DONE
