#!/usr/bin/env bash
# Round-4 end-reserve: short chip items queued behind the r8 flagship +
# alignment sweep. Each is minutes; ordered by VERDICT value.
#   1. frozen video classifier (VERDICT r3 item 5): train once on-chip,
#      commit the msgpack (eval/run.py reports fid_cls when present)
#   2. C=1 lane-padding probe (VERDICT r3 byte-lever item)
#   3. one clip-miscompile reproducer arm at the trigger shape (VERDICT r3
#      item 4's hardware leg)
# Usage: bash scripts/r8_reserve.sh [budget_seconds]
set -x
cd "$(dirname "$0")/.."
BUDGET=${1:-1500}
T0=$(date +%s)
left() { echo $(( BUDGET - ($(date +%s) - T0) )); }

timeout 600 python -m txt2vid_tpu.eval.classifier \
  --data synthetic_big/train/videos.t2vc \
  --anno synthetic_big/train/sent.pickle \
  --val_videos synthetic_big/test/videos \
  --val_anno synthetic_big/test/sent.pickle \
  --out txt2vid_tpu/eval/weights/video_cls.msgpack > /tmp/r8_cls_tpu.log 2>&1
tail -3 /tmp/r8_cls_tpu.log

[ "$(left)" -gt 300 ] && \
  timeout 600 python scripts/probe_c1_padding.py > /tmp/r8_c1probe.log 2>&1
tail -8 /tmp/r8_c1probe.log

[ "$(left)" -gt 400 ] && \
  timeout "$(left)" python scripts/repro_clip_miscompile.py \
    --level dgrad --arm fused --batch 32 --frames 32 --px 128 --iters 2 \
    > /tmp/r8_repro.log 2>&1
tail -3 /tmp/r8_repro.log
echo R8_RESERVE_DONE
