#!/usr/bin/env bash
# Round-3 continuation chain (SIXTH fresh host): unattended recovery ->
# flagship production -> capability demos -> bench warm.
#
# The host reset again wiped out/ and both datasets. This chain is the
# union of the proven pieces:
#   - r3_regen_data.sh          dataset regeneration (CPU-only)
#   - r4_queue2.sh              fresh-from-0 3-scale cond-128 arm, full
#                               mitigation stack (lazy GP --gp_every 4,
#                               split-dispatch clip 100, TTUR D_lr 1e-4,
#                               windowed NaN-abort + seed-bump rollback,
#                               checkpoint burst guard)
#   - r4_queue3.sh lesson       dense checkpoint trail (--save_model_period
#                               250) from iter 0 — rollback can always bank
#                               progress — with prune_ckpts.sh looping so the
#                               ~1.4 GB checkpoints don't fill the disk
#   - r4_queue4.sh target       TARGET_ITER 28000 = the reference's headline
#                               run length (thesis/thesis.tex:552)
#   - --g_ema 0.999             generator EMA rides along (outside the
#                               compiled step; program byte-identical)
#   - r4_ema64.sh               EMA demo at the proven 64px recipe (time
#                               permitting, after the flagship frees the chip)
#   - alignment sweep + samples + one warm bench.py at HEAD
#
# Usage: HARD_END=<epoch> bash scripts/r5_chain.sh
set -x
cd "$(dirname "$0")/.."
WD=scripts/run_with_watchdog.sh

HARD_END=${HARD_END:-$(date -d '2026-08-20 15:00 UTC' +%s)}
left() { echo $(( HARD_END - $(date +%s) )); }

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
if [ ! -f synthetic_128x8/videos.t2vc ] || [ ! -f synthetic_big/vocab.pickle ] \
   || [ ! -f synthetic_big/train/videos.t2vc ]; then
  bash scripts/r3_regen_data.sh > /tmp/r5_regen.log 2>&1 || { echo "REGEN FAILED"; exit 1; }
fi
echo R5_DATA_READY

wait_for_tpu || exit 1

# ---- 2. encoder pretrain (r2 recipe: 10 epochs, val CE ~0.03) ----
if [ ! -f out/txt_pretrain_r2/txt_final ]; then
  $WD /tmp/r5_txt_pretrain.log 900 4500 -- \
    python -m txt2vid_tpu.train.txt \
      --sentences synthetic_big/train/sent.pickle \
      --vocab synthetic_big/vocab.pickle \
      --out out/txt_pretrain_r2 --epochs 10 --seed 11
  [ -f out/txt_pretrain_r2/txt_final ] || { echo "encoder pretrain failed"; exit 1; }
fi
echo R5_ENCODER_READY

# ---- 3. flagship production: 3-scale cond-128, fresh from 0 ----
GC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 32, "width": 128, "height": 128, "additional_blocks": [64, 32], "fm_stride": 32, "remat": true}}'
DC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj", "discrim_down_blocks": [4, 4, 4]}}'
DATA='{"class": "txt2vid_tpu.data.packed.packed_dataset", "args": {"data": "synthetic_128x8/videos.t2vc", "num_frames": 32}}'

OUT=out/r4_cond128_f
TARGET_ITER=${TARGET_ITER:-28000}
mkdir -p "$OUT"

# dense trail from iter 0 (the queue3 lesson), pruned in the background:
# keep 2000-multiples (the alignment sweep's anchors) + the newest 8
bash scripts/prune_ckpts.sh --loop 600 "$OUT" 2000 8 > /tmp/r5_prune.log 2>&1 &
PRUNE_PID=$!

latest_iter() {
  ls -d "$OUT"/iter_* 2>/dev/null | grep -v '\.ema$' \
    | sed 's/.*iter_\([0-9]*\)_.*/\1/' | sort -n | tail -1
}

SEED=${SEED:-90}
for attempt in $(seq 1 20); do
  # reserve 4800 s for the EMA demo + alignment sweep + bench warm
  LEFT=$(( $(left) - 4800 ))
  [ "$LEFT" -lt 300 ] && { echo "train budget exhausted"; break; }
  IT=$(latest_iter); IT=${IT:-0}
  [ "$IT" -ge "$TARGET_ITER" ] && { echo "target iter $TARGET_ITER reached"; break; }
  CHUNK=$(( LEFT < 5400 ? LEFT : 5400 ))
  WARM=()
  [ -n "$(latest_iter)" ] && WARM=(--resume)
  wait_for_tpu || exit 1
  $WD /tmp/r5_cond128.log 1500 "$CHUNK" -- \
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
      --g_ema 0.999 \
      --batch_size 32 --epochs 160 --seed "$SEED" "${WARM[@]}" \
      --log_period 50 --save_model_period 250 --save_example_period 2000 \
      --sample_batch_size 8 \
      --out "$OUT" --out_samples "$OUT/samples"
  RC=$?
  [ $RC -eq 0 ] && continue
  if [ $RC -eq 42 ]; then
    SEED=$(( SEED + 1 ))
    echo "r5 attempt $attempt NAN_ABORT; rolling back with fresh seed $SEED"
    continue
  fi
  echo "r5 train attempt $attempt exited rc=$RC; re-probing TPU then resuming"
done
kill "$PRUNE_PID" 2>/dev/null
bash scripts/prune_ckpts.sh "$OUT" 2000 8
echo R5_FLAGSHIP_DONE iter=$(latest_iter)

# ---- 4. EMA capability demo at the proven 64px recipe (time permitting) ----
if [ "$(left)" -gt 4500 ]; then
  TARGET_ITER=12000 bash scripts/r4_ema64.sh > /tmp/r5_ema64_chain.log 2>&1
  tail -5 /tmp/r5_ema64_chain.log
fi

# ---- 5. alignment sweep over the flagship checkpoint trail ----
wait_for_tpu
FINAL=$(ls -d "$OUT"/iter_* 2>/dev/null | grep -v '\.ema$' \
        | sed 's/.*iter_\([0-9]*\)_.*/\1 &/' | sort -n | tail -1 | cut -d' ' -f2)
for IT in 6000 12000 20000 final final_ema; do
  MODE=live
  case "$IT" in
    final) CKPT=$FINAL ;;
    final_ema) CKPT=$FINAL; MODE=ema ;;
    *) CKPT=$(ls -d "$OUT"/iter_${IT}_* 2>/dev/null | grep -v '\.ema$' | head -1) ;;
  esac
  [ -n "$CKPT" ] || continue
  [ "$IT" != final ] && [ "$IT" != final_ema ] && [ "$CKPT" = "$FINAL" ] && continue
  [ "$(left)" -lt 900 ] && break
  EXTRA=()
  [ "$MODE" = ema ] && EXTRA=(--ema)
  $WD "/tmp/r5_align_${IT}.log" 900 1500 -- \
    python -m txt2vid_tpu.eval.alignment \
      --weights "$CKPT" --G "$GC3" --D "$DC3" \
      --sent txt2vid_tpu.models.txt.Seq2Seq \
      --vocab synthetic_big/vocab.pickle \
      --frame_sizes 32 64 128 --num_frames 32 --num_channels 1 \
      --k_per_class 32 --seed 5 "${EXTRA[@]}"
done

# ---- 6. bench warm: pre-validate the driver's end-of-round bench ----
wait_for_tpu
timeout 1200 python bench.py > /tmp/r5_bench_warm.json 2> /tmp/r5_bench_warm.log
cat /tmp/r5_bench_warm.json

echo R5_CHAIN_DONE
