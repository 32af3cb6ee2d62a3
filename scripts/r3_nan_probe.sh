#!/usr/bin/env bash
# NaN bisection for the 3-scale fm_stride cond-128 arm (queue-11 blew up to
# Loss_D=nan by iter ~300). Three short arms, ~370 iters each:
#   A. exact queue-11 config          -> NaN onset iter (log_period 5)
#   B. same but gradient penalty OFF  -> is the GP the source?
#   C. the proven 4-scale recipe      -> regression check: new dataset/encoder
#      (it ran 24.8k iters NaN-free on the pre-reset host)
set -x
cd "$(dirname "$0")/.."
WD=scripts/run_with_watchdog.sh

GC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 32, "width": 128, "height": 128, "additional_blocks": [64, 32], "fm_stride": 32, "remat": true}}'
DC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj", "discrim_down_blocks": [4, 4, 4]}}'
GC4='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 32, "width": 128, "height": 128, "remat": true}}'
DC4='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj"}}'
DATA='{"class": "txt2vid_tpu.data.packed.packed_dataset", "args": {"data": "synthetic_128/videos.t2vc", "num_frames": 32}}'

COMMON=(python -m txt2vid_tpu.train.gan
  --sent txt2vid_tpu.models.txt.Seq2Seq
  --sent_weights out/txt_pretrain_r2/txt_final
  --data "$DATA"
  --anno synthetic_128/train/sent.pickle
  --vocab synthetic_big/vocab.pickle
  --subsample_input --num_channels 1
  --D_loss txt2vid_tpu.gan.losses.RSGANLoss
  --G_lr 0.0002 --D_lr 0.0002 --G_beta2 0.999 --D_beta2 0.999
  --batch_size 32 --epochs 6 --seed 41
  --log_period 5 --save_model_period 100000 --save_example_period 100000
  --sample_batch_size 8 --device_data)

$WD /tmp/r3_nanprobe_A.log 600 2400 -- \
  "${COMMON[@]}" --G "$GC3" --D "$DC3" --frame_sizes 32 64 128 --gp_lambda 1.0 \
  --out /tmp/nanprobe_A --out_samples /tmp/nanprobe_A/samples

$WD /tmp/r3_nanprobe_B.log 600 2400 -- \
  "${COMMON[@]}" --G "$GC3" --D "$DC3" --frame_sizes 32 64 128 \
  --out /tmp/nanprobe_B --out_samples /tmp/nanprobe_B/samples

$WD /tmp/r3_nanprobe_C.log 600 2400 -- \
  "${COMMON[@]}" --G "$GC4" --D "$DC4" --frame_sizes 16 32 64 128 --gp_lambda 1.0 \
  --out /tmp/nanprobe_C --out_samples /tmp/nanprobe_C/samples

echo NANPROBE_DONE
