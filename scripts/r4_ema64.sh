#!/usr/bin/env bash
# Round-4 EMA capability demo at the PROVEN 64px/16f conditional recipe
# (scripts/run_r2_cond.sh — the run that reached 97.7% digit identity at 80k):
# 12k iterations with --g_ema 0.999, then the held-out alignment sweep scored
# BOTH ways (live params vs the sibling .ema average) at the final checkpoint.
# ~12-15 min of chip time at the measured 0.043-0.06 s/iter. Run AFTER the
# r4_queue2 flagship arm frees the chip.
set -x
cd "$(dirname "$0")/.."
WD=scripts/run_with_watchdog.sh

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
OUT=out/r4_ema64
TARGET_ITER=${TARGET_ITER:-12000}

latest_iter() {
  ls -d "$OUT"/iter_* 2>/dev/null | grep -v '\.ema$' \
    | sed 's/.*iter_\([0-9]*\)_.*/\1/' | sort -n | tail -1
}

for attempt in 1 2 3 4; do
  IT=$(latest_iter); IT=${IT:-0}
  [ "$IT" -ge "$TARGET_ITER" ] && break
  WARM=()
  [ -n "$(latest_iter)" ] && WARM=(--resume)
  $WD /tmp/r4_ema64.log 900 3600 -- \
    python -m txt2vid_tpu.train.gan \
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
      --bf16 --bf16_nu --g_ema 0.999 \
      --batch_size 40 --epochs 60 --seed 7 "${WARM[@]}" \
      --log_period 200 --save_model_period 2000 --save_example_period 4000 \
      --workers 2 \
      --out "$OUT" --out_samples "$OUT/samples"
  RC=$?
  [ $RC -eq 0 ] && break
  echo "r4_ema64 attempt $attempt rc=$RC; re-probing"
  wait_for_tpu || exit 1
done

FINAL=$(ls -d "$OUT"/iter_* 2>/dev/null | grep -v '\.ema$' \
        | sed 's/.*iter_\([0-9]*\)_.*/\1 &/' | sort -n | tail -1 | cut -d' ' -f2)
[ -n "$FINAL" ] || { echo "no checkpoint produced"; exit 1; }

for MODE in live ema; do
  EXTRA=()
  [ "$MODE" = ema ] && EXTRA=(--ema)
  $WD "/tmp/r4_ema64_align_${MODE}.log" 900 1500 -- \
    python -m txt2vid_tpu.eval.alignment \
      --weights "$FINAL" \
      --G '{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 16}}' \
      --D '{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj"}}' \
      --sent txt2vid_tpu.models.txt.Seq2Seq \
      --vocab synthetic_big/vocab.pickle \
      --frame_sizes 8 16 32 64 --num_frames 16 --num_channels 1 \
      --k_per_class 32 --seed 5 "${EXTRA[@]}"
done

echo R4_EMA64_DONE
