#!/usr/bin/env bash
# Round-4 ninth-session flagship: cond-128 3-scale arm with the measured
# byte-lever stack applied to TRAINING for the first time.
#
# Rationale (RESULTS.md round 7): the bench-shape measurement of
# --bf16_params is +31.6% steps/s, and bf16 compute is capability-proven at
# 64px (12k-iter runs, 100% motion alignment). The f32 flagship runs at
# 0.671 s/iter — too slow to ever reach the >=12k live-vs-EMA threshold
# inside one ~3 h session on a fleet where checkpoints never survive host
# resets (8/8 wiped). bf16 + bf16_nu + bf16_params is the only route to
# ~12k in-session; the windowed NaN-abort + seed-bump rollback + dense
# 250-iter trail (the full r5_chain mitigation stack) stays armed in case
# the half-width D backward finds a new basin at this shape.
#
# MEASURED OUTCOME (this session): the bf16 stack does NOT transfer to this
# shape — attempts at seeds 101/102/103 all hit the windowed NaN-abort within
# the first iterations (structural, not stochastic; consistent with the
# round-3 forensics that the 3-scale cond-128 D backward is numerically
# fragile on this backend). BF16=0 relaunches with the f32 proven config.
#
# Usage: HARD_END=<epoch> [BF16=0] bash scripts/r8_session.sh
set -x
cd "$(dirname "$0")/.."
WD=scripts/run_with_watchdog.sh

HARD_END=${HARD_END:-$(( $(date +%s) + 9000 ))}
left() { echo $(( HARD_END - $(date +%s) )); }

wait_for_tpu() {
  for i in $(seq 1 12); do
    if timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
      echo "TPU reachable (attempt $i)"; return 0
    fi
    echo "TPU probe $i failed; sleeping 120s"; sleep 120
  done
  echo "TPU never became reachable"; return 1
}

# encoder pretrain is launched by the session driver before this script;
# wait for it rather than re-running
for i in $(seq 1 60); do
  [ -f out/txt_pretrain_r2/txt_final ] && break
  sleep 30
done
[ -f out/txt_pretrain_r2/txt_final ] || { echo "encoder pretrain missing"; exit 1; }

GC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 32, "width": 128, "height": 128, "additional_blocks": [64, 32], "fm_stride": 32, "remat": true}}'
DC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj", "discrim_down_blocks": [4, 4, 4]}}'
DATA='{"class": "txt2vid_tpu.data.packed.packed_dataset", "args": {"data": "synthetic_128x8/videos.t2vc", "num_frames": 32}}'

OUT=${OUT:-out/r4_cond128_bf16}
TARGET_ITER=${TARGET_ITER:-28000}
RESERVE=${RESERVE:-1800}   # alignment sweep at the end
mkdir -p "$OUT"

bash scripts/prune_ckpts.sh --loop 600 "$OUT" 2000 8 > /tmp/r8_prune.log 2>&1 &
PRUNE_PID=$!

latest_iter() {
  ls -d "$OUT"/iter_* 2>/dev/null | grep -v '\.ema$' \
    | sed 's/.*iter_\([0-9]*\)_.*/\1/' | sort -n | tail -1
}

# Default OFF: the bf16 stack NaN-aborts structurally at the cond-128 shape
# (3 seeds, step ~0 — RESULTS.md round 7); a default-on invocation would burn
# the session on 13-15 min flagship compiles per retry. Opt in with BF16=1
# only after scripts/probe_bf16_flagship_nan.py attributes the NaN.
BF16=${BF16:-0}
DTYPE_FLAGS=()
[ "$BF16" != "0" ] && DTYPE_FLAGS=(--bf16 --bf16_nu --bf16_params)

SEED=${SEED:-101}
for attempt in $(seq 1 20); do
  LEFT=$(( $(left) - RESERVE ))
  [ "$LEFT" -lt 600 ] && { echo "train budget exhausted"; break; }
  IT=$(latest_iter); IT=${IT:-0}
  [ "$IT" -ge "$TARGET_ITER" ] && { echo "target iter $TARGET_ITER reached"; break; }
  CHUNK=$LEFT
  WARM=()
  [ -n "$(latest_iter)" ] && WARM=(--resume)
  wait_for_tpu || exit 1
  $WD /tmp/r8_cond128.log 1500 "$CHUNK" -- \
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
      "${DTYPE_FLAGS[@]}" \
      --g_ema 0.999 \
      --batch_size 32 --epochs 160 --seed "$SEED" "${WARM[@]}" \
      --log_period 50 --save_model_period 250 --save_example_period 2000 \
      --sample_batch_size 8 \
      --out "$OUT" --out_samples "$OUT/samples"
  RC=$?
  [ $RC -eq 0 ] && continue
  if [ $RC -eq 42 ]; then
    SEED=$(( SEED + 1 ))
    echo "r8 attempt $attempt NAN_ABORT; rolling back with fresh seed $SEED"
    continue
  fi
  echo "r8 train attempt $attempt exited rc=$RC; re-probing TPU then resuming"
done
kill "$PRUNE_PID" 2>/dev/null
bash scripts/prune_ckpts.sh "$OUT" 2000 8
echo R8_FLAGSHIP_DONE iter=$(latest_iter)

# ---- alignment sweep: the live-vs-EMA comparison at the endpoint ----
wait_for_tpu
FINAL=$(ls -d "$OUT"/iter_* 2>/dev/null | grep -v '\.ema$' \
        | sed 's/.*iter_\([0-9]*\)_.*/\1 &/' | sort -n | tail -1 | cut -d' ' -f2)
for MODE in live ema; do
  [ -n "$FINAL" ] || break
  [ "$(left)" -lt 600 ] && break
  EXTRA=()
  [ "$MODE" = ema ] && EXTRA=(--ema)
  $WD "/tmp/r8_align_${MODE}.log" 900 1500 -- \
    python -m txt2vid_tpu.eval.alignment \
      --weights "$FINAL" --G "$GC3" --D "$DC3" \
      --sent txt2vid_tpu.models.txt.Seq2Seq \
      --vocab synthetic_big/vocab.pickle \
      --frame_sizes 32 64 128 --num_frames 32 --num_channels 1 \
      --k_per_class 32 --seed 5 "${EXTRA[@]}"
done
echo R8_SESSION_DONE
