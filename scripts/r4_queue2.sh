#!/usr/bin/env bash
# Round-4 stage 2: FIFTH fresh-host recovery, fully chained into a
# fresh-from-iter-0 flagship production arm.
#
# The host reset wiped out/ and both datasets again — including the
# iter_2000/iter_10000 checkpoint trail every previous take bootstrapped
# from — so this arm restarts the 3-scale cond-128 flagship from scratch
# with the FULL mitigation stack active from iter 0 (every previous take
# acquired these one forensic episode at a time, on top of a trail whose
# early iters ran less protected):
#   --gp_every 4               lazy GP: the iter-2120+ lock-in needs
#                              every-step GP to form (RESULTS.md round 3)
#   --clip_grad 100 --clip_grad_split
#                              spike protection outside the fused-clip
#                              miscompile trigger (bisect-18)
#   TTUR D_lr 1e-4             every recorded spike was |g|D, never |g|G
#   windowed NaN-abort         (trainer default 20-in-200) exit-42 rollback
#                              with a fresh seed on any lock-in re-formation
#   checkpoint burst guard     (trainer default) no mid-onset saves
# Host packed loader (no --device_data): queue-19 rationale — device-data
# OOMs at this shape under the split path, and the host loader measured
# 0.58 s/iter vs 0.67 device-resident. --rss_limit_gb default 100 handles
# the axon H2D leak with a clean exit + --resume.
#
# Chain: regen datasets (CPU) -> encoder pretrain -> production arm to
# TARGET_ITER -> alignment sweep over the checkpoint trail -> bench warm.
set -x
cd "$(dirname "$0")/.."
WD=scripts/run_with_watchdog.sh

ROUND_END=${ROUND_END:-$(( $(date +%s) + 36000 ))}   # default: now + 10h

wait_for_tpu() {
  for i in $(seq 1 12); do
    if timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
      echo "TPU reachable (attempt $i)"; return 0
    fi
    echo "TPU probe $i failed; sleeping 120s"
    sleep 120
  done
  echo "TPU never became reachable"; return 1
}

# ---- 1. datasets (CPU-only; skip what already exists) ----
if [ ! -f synthetic_128x8/videos.t2vc ] || [ ! -f synthetic_big/vocab.pickle ]; then
  bash scripts/r3_regen_data.sh > /tmp/r4_regen.log 2>&1 || { echo "REGEN FAILED"; exit 1; }
fi

wait_for_tpu || exit 1

# ---- 2. encoder pretrain (r2 recipe: 10 epochs, val CE ~0.03) ----
if [ ! -f out/txt_pretrain_r2/txt_final ]; then
  $WD /tmp/r4_txt_pretrain.log 900 4500 -- \
    python -m txt2vid_tpu.train.txt \
      --sentences synthetic_big/train/sent.pickle \
      --vocab synthetic_big/vocab.pickle \
      --out out/txt_pretrain_r2 --epochs 10 --seed 11
  [ -f out/txt_pretrain_r2/txt_final ] || { echo "encoder pretrain failed"; exit 1; }
fi

GC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 32, "width": 128, "height": 128, "additional_blocks": [64, 32], "fm_stride": 32, "remat": true}}'
DC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj", "discrim_down_blocks": [4, 4, 4]}}'
DATA='{"class": "txt2vid_tpu.data.packed.packed_dataset", "args": {"data": "synthetic_128x8/videos.t2vc", "num_frames": 32}}'

OUT=out/r4_cond128_f
TARGET_ITER=${TARGET_ITER:-16000}
mkdir -p "$OUT"

latest_iter() {
  ls -d "$OUT"/iter_* 2>/dev/null \
    | sed 's/.*iter_\([0-9]*\)_.*/\1/' | sort -n | tail -1
}

# reserve 4200s for the alignment sweep + samples + bench warm
SEED=${SEED:-73}
for attempt in $(seq 1 14); do
  LEFT=$(( ROUND_END - $(date +%s) - 4200 ))
  [ "$LEFT" -lt 300 ] && { echo "train budget exhausted"; break; }
  IT=$(latest_iter); IT=${IT:-0}
  [ "$IT" -ge "$TARGET_ITER" ] && { echo "target iter $TARGET_ITER reached"; break; }
  CHUNK=$(( LEFT < 5400 ? LEFT : 5400 ))
  WARM=()
  [ -n "$(latest_iter)" ] && WARM=(--resume)
  wait_for_tpu || exit 1
  $WD /tmp/r4_cond128_q2.log 1500 "$CHUNK" -- \
    python -m txt2vid_tpu.train.gan \
      --G "$GC3" --D "$DC3" \
      --sent txt2vid_tpu.models.txt.Seq2Seq \
      --sent_weights out/txt_pretrain_r2/txt_final \
      --data "$DATA" \
      --anno synthetic_128x8/train/sent.pickle \
      --vocab synthetic_big/vocab.pickle \
      --frame_sizes 32 64 128 --subsample_input --num_channels 1 \
      --D_loss txt2vid_tpu.gan.losses.RSGANLoss --gp_lambda 1.0 \
      --gp_every 4 \
      --G_lr 0.0002 --D_lr 0.0001 --G_beta2 0.999 --D_beta2 0.999 \
      --clip_grad 100 --clip_grad_split \
      --batch_size 32 --epochs 80 --seed "$SEED" "${WARM[@]}" \
      --log_period 50 --save_model_period 1000 --save_example_period 2000 \
      --sample_batch_size 8 \
      --out "$OUT" --out_samples "$OUT/samples"
  RC=$?
  [ $RC -eq 0 ] && continue
  if [ $RC -eq 42 ]; then
    SEED=$(( SEED + 1 ))
    echo "r4q2 attempt $attempt NAN_ABORT; rolling back with fresh seed $SEED"
    continue
  fi
  echo "r4q2 train attempt $attempt exited rc=$RC; re-probing TPU then resuming"
done

# ---- alignment sweep over the checkpoint trail ----
wait_for_tpu
FINAL=$(ls -d "$OUT"/iter_* 2>/dev/null | sed 's/.*iter_\([0-9]*\)_.*/\1 &/' \
        | sort -n | tail -1 | cut -d' ' -f2)
for IT in 6000 12000 final; do
  if [ "$IT" = final ]; then CKPT=$FINAL
  else CKPT=$(ls -d "$OUT"/iter_${IT}_* 2>/dev/null | head -1); fi
  [ -n "$CKPT" ] || continue
  [ "$IT" != final ] && [ "$CKPT" = "$FINAL" ] && continue
  $WD "/tmp/r4_align_q2_${IT}.log" 900 1500 -- \
    python -m txt2vid_tpu.eval.alignment \
      --weights "$CKPT" --G "$GC3" --D "$DC3" \
      --sent txt2vid_tpu.models.txt.Seq2Seq \
      --vocab synthetic_big/vocab.pickle \
      --frame_sizes 32 64 128 --num_frames 32 --num_channels 1 \
      --k_per_class 32 --seed 5
done

# ---- bench warm: the driver runs bench.py at round end; prime the cache ----
$WD /tmp/r4_bench_warm.log 900 2400 -- python bench.py

echo R4_QUEUE2_DONE
