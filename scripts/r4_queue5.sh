#!/usr/bin/env bash
# Round-4 stage 5: SLACK-TIME consumer. Runs only after r4_queue4 marks
# R4_QUEUE4_DONE (the chain driver enforces that). Whatever chip time remains
# before HARD_END is spent in priority order:
#   1. one warm bench.py run (pre-validates the driver's end-of-round bench and
#      gives RESULTS a number measured at final HEAD);
#   2. continue the flagship arm past the reference's 28k headline budget
#      (TARGET_ITER 34000) under the identical protection stack — "don't stop
#      at parity";
#   3. a final alignment sweep at the extended endpoint.
# Every block is time-guarded so the chip is free well before the round ends.
set -x
cd "$(dirname "$0")/.."
WD=scripts/run_with_watchdog.sh

HARD_END=${HARD_END:-$(date -d '2026-08-20 10:30 UTC' +%s)}

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

# ---- 1. warm bench at final HEAD ----
if [ "$(left)" -gt 1200 ]; then
  wait_for_tpu || exit 1
  timeout 900 python bench.py > /tmp/r4_bench_final.json 2> /tmp/r4_bench_final.log
  cat /tmp/r4_bench_final.json
fi

# ---- 2. flagship extension past the 28k reference budget ----
GC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 32, "width": 128, "height": 128, "additional_blocks": [64, 32], "fm_stride": 32, "remat": true}}'
DC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj", "discrim_down_blocks": [4, 4, 4]}}'
DATA='{"class": "txt2vid_tpu.data.packed.packed_dataset", "args": {"data": "synthetic_128x8/videos.t2vc", "num_frames": 32}}'
OUT=out/r4_cond128_f
TARGET_ITER=${TARGET_ITER:-34000}

latest_iter() {
  ls -d "$OUT"/iter_* 2>/dev/null | grep -v '\.ema$' \
    | sed 's/.*iter_\([0-9]*\)_.*/\1/' | sort -n | tail -1
}

START_IT=$(latest_iter); START_IT=${START_IT:-0}
SEED=${SEED:-110}
for attempt in $(seq 1 8); do
  # reserve 1500 s for the endpoint alignment sweep
  LEFT=$(( $(left) - 1500 ))
  [ "$LEFT" -lt 600 ] && { echo "extension budget exhausted"; break; }
  IT=$(latest_iter); IT=${IT:-0}
  [ "$IT" -ge "$TARGET_ITER" ] && { echo "extension target reached"; break; }
  CHUNK=$(( LEFT < 3600 ? LEFT : 3600 ))
  wait_for_tpu || exit 1
  $WD /tmp/r4_cond128_q5.log 1500 "$CHUNK" -- \
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
      --batch_size 32 --epochs 250 --seed "$SEED" --resume \
      --log_period 50 --save_model_period 500 --save_example_period 2000 \
      --sample_batch_size 8 \
      --out "$OUT" --out_samples "$OUT/samples"
  RC=$?
  [ $RC -eq 0 ] && continue
  if [ $RC -eq 42 ]; then
    SEED=$(( SEED + 1 ))
    echo "r4q5 attempt $attempt NAN_ABORT; rolling back with fresh seed $SEED"
    continue
  fi
  echo "r4q5 attempt $attempt exited rc=$RC; re-probing then resuming"
done

# ---- 3. endpoint alignment sweep (only if the extension made progress) ----
END_IT=$(latest_iter); END_IT=${END_IT:-0}
if [ "$END_IT" -gt "$START_IT" ] && [ "$(left)" -gt 300 ]; then
  wait_for_tpu
  CKPT=$(ls -d "$OUT"/iter_${END_IT}_* 2>/dev/null | grep -v '\.ema$' | head -1)
  [ -n "$CKPT" ] && $WD /tmp/r4_align_q5.log 900 1400 -- \
    python -m txt2vid_tpu.eval.alignment \
      --weights "$CKPT" --G "$GC3" --D "$DC3" \
      --sent txt2vid_tpu.models.txt.Seq2Seq \
      --vocab synthetic_big/vocab.pickle \
      --frame_sizes 32 64 128 --num_frames 32 --num_channels 1 \
      --k_per_class 32 --seed 5
fi

echo R4_QUEUE5_DONE
