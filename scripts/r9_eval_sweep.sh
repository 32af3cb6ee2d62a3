#!/usr/bin/env bash
# Trajectory evidence for the cond-128 flagship (VERDICT r4 tasks 2 & 6):
# - alignment (live + EMA) at the FINAL checkpoint
# - fid_cls (frozen-classifier FID) + alignment at every 1000-multiple kept
#   on the trail, so the curve survives the next host reset even if the
#   endpoint doesn't.
# Results land in docs/r5/ as *.log with one JSON line each (commit them).
#
# Usage: bash scripts/r9_eval_sweep.sh out/r4_cond128_f32
set -x
cd "$(dirname "$0")/.."
OUT=${1:-out/r4_cond128_f32}
mkdir -p docs/r5

GC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 32, "width": 128, "height": 128, "additional_blocks": [64, 32], "fm_stride": 32, "remat": true}}'
DC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj", "discrim_down_blocks": [4, 4, 4]}}'
DATA='{"class": "txt2vid_tpu.data.packed.packed_dataset", "args": {"data": "synthetic_128x8/videos.t2vc", "num_frames": 32}}'

ckpts() {
  ls -d "$OUT"/iter_* 2>/dev/null | grep -v '\.ema$' \
    | sed 's/.*iter_\([0-9]*\)_.*/\1 &/' | sort -n
}
FINAL=$(ckpts | tail -1 | cut -d' ' -f2)
[ -n "$FINAL" ] || { echo "no checkpoints in $OUT"; exit 1; }

# alignment at the final checkpoint, live and (if the sibling exists) EMA
for MODE in live ema; do
  EXTRA=()
  if [ "$MODE" = ema ]; then
    [ -f "$FINAL.ema" ] || continue
    EXTRA=(--ema)
  fi
  timeout 1500 python -m txt2vid_tpu.eval.alignment \
    --weights "$FINAL" --G "$GC3" --D "$DC3" \
    --sent txt2vid_tpu.models.txt.Seq2Seq \
    --vocab synthetic_big/vocab.pickle \
    --frame_sizes 32 64 128 --num_frames 32 --num_channels 1 \
    --k_per_class 32 --seed 5 "${EXTRA[@]}" \
    2>&1 | tee "docs/r5/align_final_${MODE}.log" | tail -2
done

# fid_cls + alignment trajectory over kept 1000-multiples (+ the final)
for IT in $(ckpts | cut -d' ' -f1 | awk '$1 % 1000 == 0' ) FINAL_SENTINEL; do
  if [ "$IT" = FINAL_SENTINEL ]; then
    CK=$FINAL; IT=$(basename "$CK" | sed 's/iter_\([0-9]*\)_.*/\1/')
    [ -f "docs/r5/fid_iter${IT}.log" ] && continue
  else
    CK=$(ckpts | awk -v it="$IT" '$1 == it {print $2}' | head -1)
  fi
  [ -n "$CK" ] || continue
  timeout 1200 python -m txt2vid_tpu.eval.run \
    --weights "$CK" --G "$GC3" --D "$DC3" \
    --sent txt2vid_tpu.models.txt.Seq2Seq \
    --vocab synthetic_big/vocab.pickle \
    --data "$DATA" --anno synthetic_128x8/train/sent.pickle \
    --frame_sizes 32 64 128 --num_frames 32 --num_channels 1 \
    --num 256 --batch_size 16 --seed 5 --no_discrim_fid \
    2>&1 | tee "docs/r5/fid_iter${IT}.log" | tail -2
  timeout 1200 python -m txt2vid_tpu.eval.alignment \
    --weights "$CK" --G "$GC3" --D "$DC3" \
    --sent txt2vid_tpu.models.txt.Seq2Seq \
    --vocab synthetic_big/vocab.pickle \
    --frame_sizes 32 64 128 --num_frames 32 --num_channels 1 \
    --k_per_class 32 --seed 5 \
    2>&1 | tee "docs/r5/align_iter${IT}.log" | tail -2
done
echo R9_EVAL_SWEEP_DONE
