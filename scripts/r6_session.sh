#!/usr/bin/env bash
# Seventh fresh-host session chain (short session: ~55 min budget).
# The 28k cond-128 flagship does not fit a session this short, so this chain
# banks the one queued capability item six host resets in a row never got to
# execute: the EMA 64px demo (scripts/r4_ema64.sh recipe — the PROVEN
# 64px/16f conditional config that reached 97.7% digit identity at 80k),
# with the live-vs-EMA alignment comparison at the endpoint.
#
# Order is chosen around the wiped persistent compile cache:
#   1. dataset regen (synthetic_big ONLY — the 128px set is not needed and
#      costs minutes on this 1-core host)      [CPU]
#   2. overlapped with 1: one bench.py run — warms the driver's end-of-round
#      bench compile server-side                [chip]
#   3. encoder pretrain (6 min on-chip, r2 recipe, val CE ~0.03)
#   4. EMA demo in resumable chunks until TARGET_ITER or T-reserve
#   5. alignment sweep at the endpoint, live params vs the .ema average
#
# Usage: HARD_END=<epoch> bash scripts/r6_session.sh
set -x
cd "$(dirname "$0")/.."
WD=scripts/run_with_watchdog.sh

# Default the budget RELATIVE to now (~55 min): a hardcoded absolute default
# goes stale the moment the session it was written for ends, silently zeroing
# the training budget on the next invocation (ADVICE r3).
HARD_END=${HARD_END:-$(( $(date +%s) + 3300 ))}
left() { echo $(( HARD_END - $(date +%s) )); }
if [ "$(left)" -le 0 ]; then
  echo "HARD_END is in the past (left=$(left)s) — refusing to run a zero-budget chain" >&2
  exit 1
fi

wait_for_tpu() {
  for i in $(seq 1 6); do
    if timeout 240 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
      echo "TPU reachable (attempt $i)"; return 0
    fi
    echo "TPU probe $i failed; sleeping 60s"
    sleep 60
  done
  echo "TPU never became reachable"; return 1
}

# ---- 1+2. dataset regen (CPU, background) overlapped with bench warm ----
if [ ! -f synthetic_big/train/videos.t2vc ] || [ ! -f synthetic_big/vocab.pickle ]; then
  (
    export JAX_PLATFORMS=cpu
    nice -n 10 python -m txt2vid_tpu.data.synthetic --out synthetic_big \
      --num_train 8000 --num_test 1000 --num_frames 64 --frame_size 64 \
    && nice -n 10 python -m txt2vid_tpu.data --sents synthetic_big/train/sent.pickle \
      --out synthetic_big/vocab.pickle \
    && nice -n 10 python -m txt2vid_tpu.data.packed --dir synthetic_big/train/videos \
      --out synthetic_big/train/videos.t2vc \
    && echo R6_REGEN_DONE
  ) > /tmp/r6_regen.log 2>&1 &
  REGEN_PID=$!
else
  REGEN_PID=
fi

# bench stdout (the JSON line) must stay separate from stderr (JAX/compile
# warnings would corrupt the JSON under the watchdog's 2>&1 merge — ADVICE r3),
# so run it under timeout directly like r5_chain.sh does.
wait_for_tpu || exit 1
timeout 1200 python bench.py > /tmp/r6_bench_warm1.json 2> /tmp/r6_bench_warm1.log
cat /tmp/r6_bench_warm1.json

if [ -n "$REGEN_PID" ]; then
  wait "$REGEN_PID"
  grep -q R6_REGEN_DONE /tmp/r6_regen.log || { echo "REGEN FAILED"; tail -20 /tmp/r6_regen.log; exit 1; }
fi
echo R6_DATA_READY left=$(left)

# ---- 3. encoder pretrain (r2 recipe) ----
if [ ! -f out/txt_pretrain_r2/txt_final ]; then
  $WD /tmp/r6_txt_pretrain.log 900 1500 -- \
    python -m txt2vid_tpu.train.txt \
      --sentences synthetic_big/train/sent.pickle \
      --vocab synthetic_big/vocab.pickle \
      --out out/txt_pretrain_r2 --epochs 10 --seed 11
  [ -f out/txt_pretrain_r2/txt_final ] || { echo "encoder pretrain failed"; exit 1; }
fi
echo R6_ENCODER_READY left=$(left)

# ---- 4. EMA 64px demo in resumable chunks ----
OUT=out/r4_ema64
TARGET_ITER=${TARGET_ITER:-12000}
RESERVE=720   # alignment live+ema at the endpoint
mkdir -p "$OUT"

latest_iter() {
  ls -d "$OUT"/iter_* 2>/dev/null | grep -v '\.ema$' \
    | sed 's/.*iter_\([0-9]*\)_.*/\1/' | sort -n | tail -1
}

# Seed management: a NAN_ABORT rollback replayed with the SAME seed is a
# deterministic replay of the same NaN (train/gan.py --resume docs); bump the
# seed per rollback so each retry explores a fresh trajectory (ADVICE r3).
SEED=${SEED:-7}
for attempt in $(seq 1 8); do
  LEFT=$(( $(left) - RESERVE ))
  # Chunk floor at cold-compile cost: every resume chunk pays ~5-10 min of
  # compile on this transport (RESULTS.md r5); a sub-compile chunk is killed
  # mid-compile and banks nothing (ADVICE r3).
  [ "$LEFT" -lt 600 ] && { echo "train budget exhausted (left=$LEFT < compile floor)"; break; }
  IT=$(latest_iter); IT=${IT:-0}
  [ "$IT" -ge "$TARGET_ITER" ] && { echo "target iter $TARGET_ITER reached"; break; }
  CHUNK=$(( LEFT < 1800 ? LEFT : 1800 ))
  WARM=()
  [ -n "$(latest_iter)" ] && WARM=(--resume)
  wait_for_tpu || exit 1
  $WD /tmp/r6_ema64.log 900 "$CHUNK" -- \
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
      --batch_size 40 --epochs 60 --seed "$SEED" "${WARM[@]}" \
      --log_period 100 --save_model_period 1000 --save_example_period 4000 \
      --workers 2 \
      --out "$OUT" --out_samples "$OUT/samples"
  RC=$?
  if [ $RC -eq 42 ]; then
    SEED=$(( SEED + 1 ))
    echo "r6 ema64 attempt $attempt NAN_ABORT; resuming from rollback with fresh seed $SEED"
  fi
done
echo R6_EMA64_DONE iter=$(latest_iter) left=$(left)

# ---- 5. alignment at the endpoint: live vs EMA ----
FINAL=$(ls -d "$OUT"/iter_* 2>/dev/null | grep -v '\.ema$' \
        | sed 's/.*iter_\([0-9]*\)_.*/\1 &/' | sort -n | tail -1 | cut -d' ' -f2)
if [ -n "$FINAL" ]; then
  for MODE in live ema; do
    [ "$(left)" -lt 180 ] && break
    EXTRA=()
    [ "$MODE" = ema ] && EXTRA=(--ema)
    $WD "/tmp/r6_align_${MODE}.log" 600 "$(left)" -- \
      python -m txt2vid_tpu.eval.alignment \
        --weights "$FINAL" \
        --G '{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 16}}' \
        --D '{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj"}}' \
        --sent txt2vid_tpu.models.txt.Seq2Seq \
        --vocab synthetic_big/vocab.pickle \
        --frame_sizes 8 16 32 64 --num_frames 16 --num_channels 1 \
        --k_per_class 32 --seed 5 "${EXTRA[@]}"
    tail -6 "/tmp/r6_align_${MODE}.log"
  done
fi

echo R6_CHAIN_DONE left=$(left)
