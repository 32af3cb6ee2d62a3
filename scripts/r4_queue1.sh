#!/usr/bin/env bash
# Round-4 stage 1: production 3-scale cond-128 arm, take 6 — GP MITIGATION.
#
# Evidence chain (RESULTS.md round 3): the clip-free D backward goes
# permanently non-finite ~120-350 iters past iter 2000 (seeds 47-50), the
# gp_lambda-0 probe sails through (GP double-backward convicted), and the
# gp_every-4 probe (arm A, seed 61) ALSO sailed through 2000->2500 with zero
# non-finite fetches — the wall needs every-step GP to form. This arm stacks
# the two mitigations:
#   --gp_every 4      lazy GP (time-averaged strength preserved, weight x4 on
#                     GP steps): 3 of 4 steps have no double-backward at all,
#                     and the wall's feedback loop (poisoned GP step -> frozen
#                     D -> params stuck in the bad region) cannot close.
#   --clip_grad 100 --clip_grad_split   the queue-19 spike protection stays.
#
# NO --gp_quarantine here, by measurement (take 6a, 16:00): with quarantine
# on, EVERY GP step's standalone-vjp gradient came back non-finite from the
# first iteration (~13.6 leaves/GP-step, GPq 1400 by iter 2400) at the SAME
# checkpoint where arm A's FUSED GP backward was finite for 125 straight GP
# steps — the split-out GP backward is another instance of this shape's
# program-composition fragility (bisect-18 class), not a numerics problem.
# A run whose GP is always zeroed is effectively gp_lambda-0, which probe B
# showed collapses the D. Quarantine remains correct and tested on the CPU
# backend and other shapes; at THIS shape production uses lazy GP alone.
#
# Start point: out/r3_cond128_q18/iter_2000 (the last GP-bearing state before
# the wall). NOT --resume from that dir: its latest checkpoint (iter_2750) is
# the gp_lambda-0 probe's endpoint — 750 iters of GP-free dynamics with the D
# collapsed to loss 0.1. Fresh out dir, explicit --weights bootstrap, then
# --resume picks up this arm's own trail.
#
# Target: iter >= 16000 (the 64px flagship's alignment emergence was ~12k;
# checkpoint trail every 1000 for the sweep). ~14k iters at the measured
# 0.52-0.68 s/iter = 2.1-2.7 h of chip time, chunked under the watchdog.
set -x
cd "$(dirname "$0")/.."
WD=scripts/run_with_watchdog.sh

OUT=out/r4_cond128
BOOT=out/r3_cond128_q18/iter_2000_lossG_1.2457_lossD_0.5118
TARGET_ITER=${TARGET_ITER:-16000}
DEADLINE=${DEADLINE:-$(( $(date +%s) + 28800 ))}

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

wait_for_tpu || exit 1
mkdir -p "$OUT"

GC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 32, "width": 128, "height": 128, "additional_blocks": [64, 32], "fm_stride": 32, "remat": true}}'
DC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj", "discrim_down_blocks": [4, 4, 4]}}'
DATA='{"class": "txt2vid_tpu.data.packed.packed_dataset", "args": {"data": "synthetic_128x8/videos.t2vc", "num_frames": 32}}'

latest_iter() {
  ls -d "$OUT"/iter_* 2>/dev/null \
    | sed 's/.*iter_\([0-9]*\)_.*/\1/' | sort -n | tail -1
}

# Take 7+: seed must differ from take 6's 71 — per-step keys fold in
# (seed, step), so replaying 71 from the iter_10000 checkpoint would
# deterministically re-enter the iter-10950 lock-in. The new windowed
# NaN-abort (trainer --nan_abort_window, default 20-in-200) turns any
# re-lock-in into an exit-42 rollback within ~100 iters instead of the
# take-6 zombie walk.
SEED=${SEED:-72}
for attempt in $(seq 1 12); do
  LEFT=$(( DEADLINE - $(date +%s) ))
  [ "$LEFT" -lt 300 ] && { echo "train deadline reached"; break; }
  IT=$(latest_iter); IT=${IT:-0}
  [ "$IT" -ge "$TARGET_ITER" ] && { echo "target iter $TARGET_ITER reached"; break; }
  CHUNK=$(( LEFT < 5400 ? LEFT : 5400 ))
  if [ -z "$(latest_iter)" ]; then
    WARM=(--weights "$BOOT")
  else
    WARM=(--resume)
  fi
  $WD /tmp/r4_cond128_q1.log 1500 "$CHUNK" -- \
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
      --batch_size 32 --epochs 60 --seed "$SEED" "${WARM[@]}" \
      --log_period 50 --save_model_period 1000 --save_example_period 2000 \
      --sample_batch_size 8 \
      --out "$OUT" --out_samples "$OUT/samples"
  RC=$?
  [ $RC -eq 0 ] && continue
  if [ $RC -eq 42 ]; then
    SEED=$(( SEED + 1 ))
    echo "r4q1 attempt $attempt NAN_ABORT; rolling back with fresh seed $SEED"
    continue
  fi
  echo "r4q1 train attempt $attempt exited rc=$RC; re-probing TPU then resuming"
  wait_for_tpu || exit 1
done

# ---- alignment sweep over the checkpoint trail ----
wait_for_tpu
for IT in 6000 10000 final; do
  if [ "$IT" = final ]; then
    CKPT=$(ls -d "$OUT"/iter_* 2>/dev/null | sed 's/.*iter_\([0-9]*\)_.*/\1 &/' \
           | sort -n | tail -1 | cut -d' ' -f2)
  else
    CKPT=$(ls -d "$OUT"/iter_${IT}_* 2>/dev/null | head -1)
  fi
  [ -n "$CKPT" ] || continue
  $WD "/tmp/r4_align_q1_${IT}.log" 900 1200 -- \
    python -m txt2vid_tpu.eval.alignment \
      --weights "$CKPT" --G "$GC3" --D "$DC3" \
      --sent txt2vid_tpu.models.txt.Seq2Seq \
      --vocab synthetic_big/vocab.pickle \
      --frame_sizes 32 64 128 --num_frames 32 --num_channels 1 \
      --k_per_class 32 --seed 5
done

echo R4_QUEUE1_DONE
