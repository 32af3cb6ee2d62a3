#!/usr/bin/env bash
# Round-4 stage 4: CONTINUATION of the fresh-from-0 flagship arm to the
# reference's headline run length. The reference's flagship unconditional run
# was 28,000 iterations at 128px (thesis/thesis.tex:552); queue3 targets 16k
# for the conditional 3-scale arm. This stage resumes out/r4_cond128_f and
# trains to TARGET_ITER (default 28000) under the identical protection stack,
# then re-runs the held-out alignment sweep at the new endpoints and refreshes
# sample grids. Numerics identical to queue3 except --save_model_period 500
# (the dense 250 trail was a basin intervention; past it, 500 halves the
# checkpoint-write overhead while keeping rollback granularity tight).
set -x
cd "$(dirname "$0")/.."
WD=scripts/run_with_watchdog.sh

ROUND_END=${ROUND_END:-$(( $(date +%s) + 21600 ))}

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

GC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 32, "width": 128, "height": 128, "additional_blocks": [64, 32], "fm_stride": 32, "remat": true}}'
DC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj", "discrim_down_blocks": [4, 4, 4]}}'
DATA='{"class": "txt2vid_tpu.data.packed.packed_dataset", "args": {"data": "synthetic_128x8/videos.t2vc", "num_frames": 32}}'

OUT=out/r4_cond128_f
TARGET_ITER=${TARGET_ITER:-28000}
GP_EVERY=${GP_EVERY:-4}

latest_iter() {
  ls -d "$OUT"/iter_* 2>/dev/null | grep -v '\.ema$' \
    | sed 's/.*iter_\([0-9]*\)_.*/\1/' | sort -n | tail -1
}

SEED=${SEED:-90}
for attempt in $(seq 1 16); do
  LEFT=$(( ROUND_END - $(date +%s) - 3600 ))
  [ "$LEFT" -lt 300 ] && { echo "train budget exhausted"; break; }
  IT=$(latest_iter); IT=${IT:-0}
  [ "$IT" -ge "$TARGET_ITER" ] && { echo "target iter $TARGET_ITER reached"; break; }
  CHUNK=$(( LEFT < 5400 ? LEFT : 5400 ))
  wait_for_tpu || exit 1
  $WD /tmp/r4_cond128_q4.log 1500 "$CHUNK" -- \
    python -m txt2vid_tpu.train.gan \
      --G "$GC3" --D "$DC3" \
      --sent txt2vid_tpu.models.txt.Seq2Seq \
      --sent_weights out/txt_pretrain_r2/txt_final \
      --data "$DATA" \
      --anno synthetic_128x8/train/sent.pickle \
      --vocab synthetic_big/vocab.pickle \
      --frame_sizes 32 64 128 --subsample_input --num_channels 1 \
      --D_loss txt2vid_tpu.gan.losses.RSGANLoss --gp_lambda 1.0 \
      --gp_every "$GP_EVERY" \
      --G_lr 0.0002 --D_lr 0.0001 --G_beta2 0.999 --D_beta2 0.999 \
      --clip_grad 100 --clip_grad_split \
      --batch_size 32 --epochs 200 --seed "$SEED" --resume \
      --log_period 50 --save_model_period 500 --save_example_period 2000 \
      --sample_batch_size 8 \
      --out "$OUT" --out_samples "$OUT/samples"
  RC=$?
  [ $RC -eq 0 ] && continue
  if [ $RC -eq 42 ]; then
    SEED=$(( SEED + 1 ))
    echo "r4q4 attempt $attempt NAN_ABORT; rolling back with fresh seed $SEED"
    continue
  fi
  echo "r4q4 train attempt $attempt exited rc=$RC; re-probing TPU then resuming"
done

# ---- final alignment sweep over the extended trail ----
wait_for_tpu
FINAL=$(ls -d "$OUT"/iter_* 2>/dev/null | grep -v '\.ema$' \
        | sed 's/.*iter_\([0-9]*\)_.*/\1 &/' | sort -n | tail -1 | cut -d' ' -f2)
for IT in 20000 24000 final; do
  if [ "$IT" = final ]; then CKPT=$FINAL
  else CKPT=$(ls -d "$OUT"/iter_${IT}_* 2>/dev/null | grep -v '\.ema$' | head -1); fi
  [ -n "$CKPT" ] || continue
  [ "$IT" != final ] && [ "$CKPT" = "$FINAL" ] && continue
  $WD "/tmp/r4_align_q4_${IT}.log" 900 1500 -- \
    python -m txt2vid_tpu.eval.alignment \
      --weights "$CKPT" --G "$GC3" --D "$DC3" \
      --sent txt2vid_tpu.models.txt.Seq2Seq \
      --vocab synthetic_big/vocab.pickle \
      --frame_sizes 32 64 128 --num_frames 32 --num_channels 1 \
      --k_per_class 32 --seed 5
done

echo R4_QUEUE4_DONE
