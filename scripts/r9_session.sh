#!/usr/bin/env bash
# Round-5 flagship chain: resume the banked cond-128 f32 trail
# (out/r4_cond128_f32, iter 3250) toward the 28k headline, with
# (a) the padding-free C=1 stem active (models/resnet3d.py _C1Conv3d —
#     same params, ~4x less stem HBM traffic), and
# (b) ONE opportunistic bf16 attempt first (BF16_TRY=1, default): the
#     round-5 CPU probe showed the full bf16 stack FINITE on the CPU
#     backend (hypothesis (b): the step-0 NaN is the TPU
#     program-composition miscompile family) — and the folded stem CHANGES
#     the D-backward program composition, so the bf16 stack may now
#     compile finite. One attempt costs ~15 min (one compile + a few
#     steps); success is worth +32% on everything after. rc=42 inside the
#     attempt => fall back to f32 permanently (no seed-bump retries at
#     half precision: the r4 negative was structural).
# The f32-trail <-> bf16-config resume is legal since restore_state casts
# moments to the template dtype (utils/checkpoint.py).
#
# Usage: [HARD_END=<epoch>] [BF16_TRY=1] [OUT=out/r4_cond128_f32] bash scripts/r9_session.sh
set -x
cd "$(dirname "$0")/.."
WD=scripts/run_with_watchdog.sh

HARD_END=${HARD_END:-$(( $(date +%s) + 14400 ))}
left() { echo $(( HARD_END - $(date +%s) )); }

wait_for_tpu() {
  for i in $(seq 1 30); do
    if timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
      echo "TPU reachable (attempt $i)"; return 0
    fi
    echo "TPU probe $i failed; sleeping 120s"; sleep 120
  done
  echo "TPU never became reachable"; return 1
}

[ -f out/txt_pretrain_r2/txt_final ] || { echo "encoder pretrain missing"; exit 1; }

GC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 32, "width": 128, "height": 128, "additional_blocks": [64, 32], "fm_stride": 32, "remat": true}}'
DC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj", "discrim_down_blocks": [4, 4, 4]}}'
DATA='{"class": "txt2vid_tpu.data.packed.packed_dataset", "args": {"data": "synthetic_128x8/videos.t2vc", "num_frames": 32}}'

OUT=${OUT:-out/r4_cond128_f32}
TARGET_ITER=${TARGET_ITER:-28000}
RESERVE=${RESERVE:-2100}   # alignment + fid_cls sweep at the end
mkdir -p "$OUT"

bash scripts/prune_ckpts.sh --loop 600 "$OUT" 1000 10 > /tmp/r9_prune.log 2>&1 &
PRUNE_PID=$!

latest_iter() {
  ls -d "$OUT"/iter_* 2>/dev/null | grep -v '\.ema$' \
    | sed 's/.*iter_\([0-9]*\)_.*/\1/' | sort -n | tail -1
}

run_chunk() {  # $1 = "bf16" | "f32", $2 = chunk seconds
  local DTYPE_FLAGS=()
  [ "$1" = bf16 ] && DTYPE_FLAGS=(--bf16 --bf16_nu --bf16_params)
  local WARM=()
  [ -n "$(latest_iter)" ] && WARM=(--resume)
  $WD /tmp/r9_cond128.log 1500 "$2" -- \
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
}

SEED=${SEED:-90}
MODE=f32
if [ "${BF16_TRY:-1}" = 1 ]; then
  wait_for_tpu || exit 1
  IT0=$(latest_iter); IT0=${IT0:-0}
  run_chunk bf16 $(( $(left) - RESERVE ))
  RC=$?
  IT1=$(latest_iter); IT1=${IT1:-0}
  if [ $RC -eq 42 ] && [ "$IT1" -le $(( IT0 + 250 )) ]; then
    echo "r9 bf16 attempt NAN_ABORT near resume point (iter $IT0 -> $IT1): structural, falling back to f32"
    MODE=f32
  elif [ $RC -eq 42 ]; then
    echo "r9 bf16 made progress to $IT1 then aborted: seed-bump and stay bf16"
    SEED=$(( SEED + 1 )); MODE=bf16
  else
    echo "r9 bf16 chunk exited rc=$RC at iter $IT1; staying bf16"
    MODE=bf16
  fi
fi

for attempt in $(seq 1 20); do
  LEFT=$(( $(left) - RESERVE ))
  [ "$LEFT" -lt 600 ] && { echo "train budget exhausted"; break; }
  IT=$(latest_iter); IT=${IT:-0}
  [ "$IT" -ge "$TARGET_ITER" ] && { echo "target iter $TARGET_ITER reached"; break; }
  wait_for_tpu || exit 1
  run_chunk "$MODE" "$LEFT"
  RC=$?
  [ $RC -eq 0 ] && continue
  if [ $RC -eq 42 ]; then
    SEED=$(( SEED + 1 ))
    echo "r9 attempt $attempt NAN_ABORT; rolling back with fresh seed $SEED"
    # bf16 mode that starts NaN-aborting repeatedly: drop to the proven f32
    if [ "$MODE" = bf16 ]; then
      N_BF16_ABORT=$(( ${N_BF16_ABORT:-0} + 1 ))
      [ "$N_BF16_ABORT" -ge 3 ] && { echo "3 bf16 aborts; falling back to f32"; MODE=f32; }
    fi
    continue
  fi
  echo "r9 train attempt $attempt exited rc=$RC; re-probing TPU then resuming"
done
kill "$PRUNE_PID" 2>/dev/null
bash scripts/prune_ckpts.sh "$OUT" 1000 10
echo R9_FLAGSHIP_DONE iter=$(latest_iter)

# ---- endpoint + trajectory evidence: alignment (live+ema) and fid_cls ----
wait_for_tpu
bash scripts/r9_eval_sweep.sh "$OUT" || true
echo R9_SESSION_DONE
