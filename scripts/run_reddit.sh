#!/usr/bin/env bash
# reddit-videos stretch config (BASELINE.json): conditional TGANv2 at 128px / 32
# frames, bf16 compute. At this scale the non-local attention spans T*H*W = 32*64*64
# tokens at the penultimate scale; the fused Pallas kernel keeps the map out of HBM.
# On a multi-chip slice, add EXTRA="--sp <k>" to ring-shard the attention tokens over
# k chips of the mesh (ops/ring_attention.py via the sequence_parallel dispatch).
set -e
DATA=${DATA:-config/reddit_videos.json}
ANNO=${ANNO:-./reddit_videos/annos.pickle}
VOCAB=${VOCAB:-./reddit_videos/vocab.pickle}
BATCH_SIZE=${BATCH_SIZE:-32}
EPOCHS=${EPOCHS:-100}
OUT=${OUT:-out/reddit}
EXTRA=${EXTRA:-}

python -m txt2vid_tpu.train.gan \
    --G '{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"width": 128, "height": 128, "num_frames": 32}}' \
    --D txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim \
    --sent txt2vid_tpu.models.txt.Seq2Seq \
    --data "$DATA" --anno "$ANNO" --vocab "$VOCAB" \
    --frame_sizes 16 32 64 128 --subsample_input --num_channels 3 --bf16 \
    --D_loss txt2vid_tpu.gan.losses.RSGANLoss \
    --G_lr 0.0002 --D_lr 0.0002 --G_beta2 0.999 --D_beta2 0.999 \
    --batch_size "$BATCH_SIZE" --epochs "$EPOCHS" \
    --out "$OUT" --out_samples "$OUT/samples" $EXTRA
