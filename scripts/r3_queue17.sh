#!/usr/bin/env bash
# Round-3 stage 17: production 3-scale fm_stride cond-128 arm, take 3.
# Queue-16 post-mortem (RESULTS.md round 3): the take-2 production arm ran
# 5.3k iters with a BIT-FROZEN discriminator — on the TPU backend the
# flagship D backward compiles to NaN gradients whenever the in-step clip's
# scale-and-select ops are in the same program, and the clip guard then
# zeroes every D update from iter 1.  Two fixes in this take:
#   * jax.lax.optimization_barrier between the backward and the clip math
#     (gan/train_step.py:_norm_and_clip) — verified finite |g|D on-chip at
#     the flagship shape (scripts/probe_gnorm_tpu.py --flagship --clip 50)
#   * the launch gate below now ALSO requires the |g|D/|g|G metrics to be
#     present and finite in the probe log; queue-16's gate only checked the
#     losses, which is exactly how the frozen D slipped through.
# Fresh run dir (q17): the q14 checkpoints are poisoned (G trained against a
# frozen random D).
set -x
cd "$(dirname "$0")/.."
WD=scripts/run_with_watchdog.sh

# Hard round end (driver margin included); see RESULTS.md round-3 timeline.
ROUND_END=${ROUND_END:-1787146000}

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

# ---- datasets + encoder (skip if the host kept them) ----
if [ ! -f synthetic_128x8/videos.t2vc ] || [ ! -f synthetic_big/vocab.pickle ]; then
  bash scripts/r3_regen_data.sh > /tmp/r3_regen.log 2>&1 || { echo "REGEN FAILED"; exit 1; }
fi
wait_for_tpu || exit 1
if [ ! -f out/txt_pretrain_r2/txt_final ]; then
  $WD /tmp/r3_txt_pretrain.log 900 3600 -- \
    python -m txt2vid_tpu.train.txt \
      --sentences synthetic_big/train/sent.pickle \
      --vocab synthetic_big/vocab.pickle \
      --out out/txt_pretrain_r2 --epochs 10 --seed 11
  [ -f out/txt_pretrain_r2/txt_final ] || { echo "encoder pretrain failed"; exit 1; }
fi

GC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 32, "width": 128, "height": 128, "additional_blocks": [64, 32], "fm_stride": 32, "remat": true}}'
DC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj", "discrim_down_blocks": [4, 4, 4]}}'
DATA='{"class": "txt2vid_tpu.data.packed.packed_dataset", "args": {"data": "synthetic_128x8/videos.t2vc", "num_frames": 32}}'

# ---- barrier-fix probe: 1 epoch (250 iters) through the real CLI ----
wait_for_tpu || exit 1
rm -rf out/r3_clip_probe_b
$WD /tmp/r3_clip_probe_b.log 900 2400 -- \
  python -m txt2vid_tpu.train.gan \
    --G "$GC3" --D "$DC3" \
    --sent txt2vid_tpu.models.txt.Seq2Seq \
    --sent_weights out/txt_pretrain_r2/txt_final \
    --data "$DATA" \
    --anno synthetic_128x8/train/sent.pickle \
    --vocab synthetic_big/vocab.pickle \
    --frame_sizes 32 64 128 --subsample_input --num_channels 1 \
    --D_loss txt2vid_tpu.gan.losses.RSGANLoss --gp_lambda 1.0 \
    --G_lr 0.0002 --D_lr 0.0002 --G_beta2 0.999 --D_beta2 0.999 \
    --clip_grad 50 \
    --batch_size 32 --epochs 1 --seed 41 \
    --log_period 10 --save_model_period 100000 --save_example_period 100000 \
    --sample_batch_size 8 --device_data \
    --out out/r3_clip_probe_b --out_samples out/r3_clip_probe_b/samples

# ---- launch gate: finite losses AND present+finite grad-norm metrics ----
NLINES=$(grep -c "Loss_D:" /tmp/r3_clip_probe_b.log || true)
NGN=$(grep -c "|g|D:" /tmp/r3_clip_probe_b.log || true)
NNAN=$(grep -c "Loss_D: nan\|Loss_G: nan\|non-finite" /tmp/r3_clip_probe_b.log || true)
echo "barrier probe: $NLINES loss lines, $NGN gnorm lines, $NNAN bad lines"
if [ "$NNAN" -ne 0 ] || [ "$NLINES" -lt 15 ] || [ "$NGN" -lt 15 ]; then
  echo "BARRIER_PROBE_FAILED (lines=$NLINES gnorm=$NGN bad=$NNAN) — not launching production"
  exit 2
fi
echo BARRIER_PROBE_OK

# ---- production arm, fresh dir, full remaining budget ----
REMAIN=$(( ROUND_END - $(date +%s) - 4500 ))
[ "$REMAIN" -lt 600 ] && { echo "no budget left for production"; exit 3; }
DEADLINE=$(( $(date +%s) + REMAIN ))

DEVFLAG=--device_data
for attempt in 1 2 3 4 5 6 7 8; do
  LEFT=$(( DEADLINE - $(date +%s) ))
  [ "$LEFT" -lt 300 ] && { echo "train deadline reached"; break; }
  CHUNK=$(( LEFT < 5400 ? LEFT : 5400 ))
  $WD /tmp/r3_cond128_q17.log 900 "$CHUNK" -- \
    python -m txt2vid_tpu.train.gan \
      --G "$GC3" --D "$DC3" \
      --sent txt2vid_tpu.models.txt.Seq2Seq \
      --sent_weights out/txt_pretrain_r2/txt_final \
      --data "$DATA" \
      --anno synthetic_128x8/train/sent.pickle \
      --vocab synthetic_big/vocab.pickle \
      --frame_sizes 32 64 128 --subsample_input --num_channels 1 \
      --D_loss txt2vid_tpu.gan.losses.RSGANLoss --gp_lambda 1.0 \
      --G_lr 0.0002 --D_lr 0.0002 --G_beta2 0.999 --D_beta2 0.999 \
      --clip_grad 50 \
      --batch_size 32 --epochs 160 --seed 41 --resume \
      --log_period 50 --save_model_period 2000 --save_example_period 2000 \
      --sample_batch_size 8 $DEVFLAG \
      --out out/r3_cond128_q17 --out_samples out/r3_cond128_q17/samples
  RC=$?
  [ $RC -eq 0 ] && break
  if grep -q "RESOURCE_EXHAUSTED\|Out of memory\|out of memory" /tmp/r3_cond128_q17.log; then
    echo "q17 attempt $attempt hit device OOM; falling back to host packed loader"
    DEVFLAG=""
  fi
  echo "q17 train attempt $attempt exited rc=$RC; re-probing TPU then resuming"
  wait_for_tpu || exit 1
done

# ---- alignment sweep over the checkpoint trail ----
for IT in 6000 12000 20000 final; do
  if [ "$IT" = final ]; then
    CKPT=$(ls -td out/r3_cond128_q17/iter_* 2>/dev/null | head -1)
  else
    CKPT=$(ls -d out/r3_cond128_q17/iter_${IT}_* 2>/dev/null | head -1)
  fi
  [ -n "$CKPT" ] || continue
  $WD "/tmp/r3_align_q17_${IT}.log" 900 1500 -- \
    python -m txt2vid_tpu.eval.alignment \
      --weights "$CKPT" --G "$GC3" --D "$DC3" \
      --sent txt2vid_tpu.models.txt.Seq2Seq \
      --vocab synthetic_big/vocab.pickle \
      --frame_sizes 32 64 128 --num_frames 32 --num_channels 1 \
      --k_per_class 32 --seed 5
done

# warm the bench compile cache for the driver's end-of-round bench
$WD /tmp/r3_bench_warm.log 900 1800 -- python bench.py

echo QUEUE17_DONE
