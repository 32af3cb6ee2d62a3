#!/usr/bin/env bash
# 128px / 32-frame unconditional TGANv2 (the reference's headline uncond run shape,
# thesis.tex:552: batch 128 @ 128x128, frame_sizes 16/32/64/128, subsample pyramid,
# RSGAN + zero-centered GP 0.5 — scripts/run_tganv2.sh). Validates the long-clip /
# high-res path on real hardware; records steps/s at this config.
set -e
cd "$(dirname "$0")/.."
exec python -m txt2vid_tpu.train.gan \
    --G '{"class": "txt2vid_tpu.models.tganv2.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 32, "width": 128, "height": 128, "remat": true}}' \
    --D '{"class": "txt2vid_tpu.models.tganv2.MultiScaleDiscrim", "args": {"num_channels": 1}}' \
    --dont_use_sent \
    --data '{"class": "txt2vid_tpu.data.packed.packed_dataset", "args": {"data": "synthetic_128/videos.t2vc", "num_frames": 32}}' \
    --frame_sizes 16 32 64 128 --subsample_input --num_channels 1 \
    --D_loss txt2vid_tpu.gan.losses.RSGANLoss --gp_lambda 0.5 \
    --G_lr 0.0002 --D_lr 0.0002 --G_beta2 0.999 --D_beta2 0.999 \
    --batch_size "${BATCH_SIZE:-32}" --epochs "${EPOCHS:-25}" --seed 3 \
    --log_period 25 --save_model_period 200 --save_example_period 200 \
    --workers 2 \
    --out out/r2_128px --out_samples out/r2_128px/samples "$@"
