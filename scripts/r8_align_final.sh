#!/usr/bin/env bash
# Alignment eval of the newest r8 flagship checkpoint (live or --ema).
# Usage: bash scripts/r8_align_final.sh [live|ema] [out_dir]
set -x
cd "$(dirname "$0")/.."
MODE=${1:-live}
OUT=${2:-out/r4_cond128_f32}
GC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 32, "width": 128, "height": 128, "additional_blocks": [64, 32], "fm_stride": 32, "remat": true}}'
DC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj", "discrim_down_blocks": [4, 4, 4]}}'
FINAL=$(ls -d "$OUT"/iter_* 2>/dev/null | grep -v '\.ema$' \
        | sed 's/.*iter_\([0-9]*\)_.*/\1 &/' | sort -n | tail -1 | cut -d' ' -f2)
[ -n "$FINAL" ] || { echo "no checkpoint"; exit 1; }
EXTRA=()
[ "$MODE" = ema ] && EXTRA=(--ema)
timeout 1500 python -m txt2vid_tpu.eval.alignment \
  --weights "$FINAL" --G "$GC3" --D "$DC3" \
  --sent txt2vid_tpu.models.txt.Seq2Seq \
  --vocab synthetic_big/vocab.pickle \
  --frame_sizes 32 64 128 --num_frames 32 --num_channels 1 \
  --k_per_class 32 --seed 5 "${EXTRA[@]}"
