#!/usr/bin/env bash
# Round-3 fresh-host data regeneration (host reset wiped out/ and datasets).
# Produces, CPU-only:
#   synthetic_big/       8000 train @ 64f/64px (+1000 test), vocab, packed train
#   synthetic_128x8/     8000 train @ 32f/128px (+512 test), packed train
# Paths match scripts/run_r2_cond.sh and scripts/r3_queue14.sh expectations.
set -ex
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu

python -m txt2vid_tpu.data.synthetic --out synthetic_big \
  --num_train 8000 --num_test 1000 --num_frames 64 --frame_size 64
python -m txt2vid_tpu.data --sents synthetic_big/train/sent.pickle \
  --out synthetic_big/vocab.pickle
python -m txt2vid_tpu.data.packed --dir synthetic_big/train/videos \
  --out synthetic_big/train/videos.t2vc

python -m txt2vid_tpu.data.synthetic --out synthetic_128x8 \
  --num_train 8000 --num_test 512 --num_frames 32 --frame_size 128
python -m txt2vid_tpu.data.packed --dir synthetic_128x8/train/videos \
  --out synthetic_128x8/videos.t2vc

du -sh synthetic_big synthetic_128x8
echo REGEN_DONE
