#!/usr/bin/env bash
# Round-4 endgame: chip tasks that run AFTER the flagship chain frees the TPU.
#   1. frozen video-classifier training (eval/classifier.py) — the CPU host is
#      too slow for its 1500 steps (>6 s/step contended); on-chip it is minutes.
#      Produces txt2vid_tpu/eval/weights/video_cls.msgpack (checked in).
#   2. classifier-FID trajectory over the flagship checkpoint trail — the
#      discriminative-fidelity evidence the random-conv FID lacked (VERDICT r3
#      item 5: "show it actually separates checkpoints").
#   3. byte-lever measurement: bench.py warm baseline vs BENCH_BF16_PARAMS=1
#      (f32-master/bf16-compute params). Adopt in bench defaults only if it
#      wins; always leave the DEFAULT config's cache entry warm for the driver.
#   4. the standalone clip-miscompile reproducer, bounded (VERDICT r3 item 4's
#      run leg).
# Usage: bash scripts/r4_endgame.sh [out_dir_of_flagship]
set -x
cd "$(dirname "$0")/.."
OUT=${1:-out/r4_cond128_f}
GC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 32, "width": 128, "height": 128, "additional_blocks": [64, 32], "fm_stride": 32, "remat": true}}'
DC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj", "discrim_down_blocks": [4, 4, 4]}}'

# ---- 1. classifier training on-chip ----
if [ ! -f txt2vid_tpu/eval/weights/video_cls.msgpack ]; then
  timeout 1800 python -m txt2vid_tpu.eval.classifier \
    --data synthetic_big/train/videos.t2vc \
    --anno synthetic_big/train/sent.pickle \
    --val_videos synthetic_big/test/videos \
    --val_anno synthetic_big/test/sent.pickle \
    --val_n 300 --steps 1500 --batch_size 64 --seed 0 \
    2> /tmp/r4_cls.log | tee /tmp/r4_cls.json
fi

# ---- 2. classifier-FID over the flagship trail ----
for CKPT in $(ls -d "$OUT"/iter_* 2>/dev/null | grep -v '\.ema$'); do
  IT=$(echo "$CKPT" | sed 's/.*iter_\([0-9]*\)_.*/\1/')
  case "$IT" in *000) ;; *) continue ;; esac
  [ $(( IT % 6000 )) -eq 0 ] || [ "$IT" -ge 20000 ] || continue
  timeout 1200 python -m txt2vid_tpu.eval.run \
    --weights "$CKPT" --G "$GC3" --D "$DC3" \
    --sent txt2vid_tpu.models.txt.Seq2Seq \
    --vocab synthetic_big/vocab.pickle \
    --data synthetic_128x8/videos.t2vc --anno synthetic_128x8/train/sent.pickle \
    --frame_sizes 32 64 128 --num_frames 32 --num_channels 1 \
    --num 256 --batch_size 16 --no_discrim_fid --seed 3 \
    2> "/tmp/r4_fid_${IT}.log" | tee "/tmp/r4_fid_${IT}.json"
done

# ---- 3. byte-lever measurement ----
timeout 1500 python bench.py > /tmp/r4_bench_base.json 2> /tmp/r4_bench_base.log
BENCH_BF16_PARAMS=1 timeout 1500 python bench.py \
  > /tmp/r4_bench_bf16p.json 2> /tmp/r4_bench_bf16p.log
cat /tmp/r4_bench_base.json /tmp/r4_bench_bf16p.json

# ---- 4. clip-miscompile reproducer: the two decisive cells (bounded; the
# full sweep is hours of 128px compiles on this transport) ----
for ARM in off fused; do
  timeout 1500 python scripts/repro_clip_miscompile.py \
    --level dgrad --arm "$ARM" --batch 32 --frames 32 --px 128 --iters 4 \
    2> "/tmp/r4_repro_${ARM}.log" | tee "/tmp/r4_repro_${ARM}.json"
done

echo R4_ENDGAME_DONE
