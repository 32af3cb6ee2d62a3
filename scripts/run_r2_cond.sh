#!/usr/bin/env bash
# Round-2 conditional run: TGANv2-cond on synthetic moving-MNIST (64px, 16f) with the
# PRETRAINED sentence encoder, packed native input path, RSGAN + GP(0.5).
set -e
cd "$(dirname "$0")/.."
exec python -m txt2vid_tpu.train.gan \
    --G '{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 16}}' \
    --D '{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj"}}' \
    --sent txt2vid_tpu.models.txt.Seq2Seq \
    --sent_weights out/txt_pretrain_r2/txt_final \
    --data '{"class": "txt2vid_tpu.data.packed.packed_dataset", "args": {"data": "synthetic_big/train/videos.t2vc", "num_frames": 16}}' \
    --anno synthetic_big/train/sent.pickle \
    --vocab synthetic_big/vocab.pickle \
    --frame_sizes 8 16 32 64 --subsample_input --num_channels 1 \
    --D_loss txt2vid_tpu.gan.losses.RSGANLoss --gp_lambda 0.5 \
    --G_lr 0.0002 --D_lr 0.0002 --G_beta2 0.999 --D_beta2 0.999 \
    --batch_size 40 --epochs "${EPOCHS:-100}" --seed 7 \
    --log_period 50 --save_model_period 1000 --save_example_period 2500 \
    --workers 2 \
    --out out/r2_cond --out_samples out/r2_cond/samples "$@"
