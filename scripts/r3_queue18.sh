#!/usr/bin/env bash
# Round-3 stage 18: production 3-scale fm_stride cond-128 arm, take 4 — CLIP-FREE.
#
# Why clip-free (RESULTS.md round 3, bisect-18): at the flagship shape
# (batch 32, 3-scale cond-128) the TPU backend compiles the D backward to NaN
# whenever ANY clip formulation is in the program — optax chain (queue-14),
# in-step select (queue-16, silently froze the D for 5.3k iters), and
# barrier+in-step (queue-17 gate, bisect-18 Arm B all reproduce it) — while
# the clip-free program is finite iter-for-iter (bisect-18 Arm A: 250 iters
# through the REAL trainer CLI, |g|D 13-67 band, 0.675 s/iter).
#
# Spike protection is therefore host-side: trainer.NanAbort fires on a
# non-finite loss or unclipped non-finite grad norm BEFORE the periodic
# checkpoint save (poisoned states never reach disk), train/gan.py exits 42,
# and this harness resumes from the last good checkpoint with a FRESH seed so
# the rolled-back run diverges from the replay instead of re-entering the
# same spike.
set -x
cd "$(dirname "$0")/.."
WD=scripts/run_with_watchdog.sh

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

# ---- production arm: clip-free + NaN-abort rollback, full remaining budget ----
# No pre-probe: bisect-18 Arm A IS the probe (same CLI, same config, clip 0,
# 250 iters finite on this host's chip an hour ago).
#
# TTUR (D_lr 1e-4, G_lr 2e-4): the first launch at D_lr 2e-4 hit three
# consecutive D-grad-spike NaN aborts before the first checkpoint (iters 723,
# 1156, 407 on seeds 41/42/43 — |g|D spiking 300..1800 then loss NaN), i.e.
# the 3-scale arm's 32px-base discriminator is spike-unstable at the 4-scale
# arm's lr with clipping unavailable (the shape's clip miscompile,
# RESULTS.md). Every spike was in |g|D, never |g|G, and the uncond-128
# lr-1e-4 branch was the stable one — so halve the D lr only. Checkpoints
# every 1000 iters bound the rollback loss if a spike still lands.
REMAIN=$(( ROUND_END - $(date +%s) - 4800 ))
[ "$REMAIN" -lt 600 ] && { echo "no budget left for production"; exit 3; }
DEADLINE=$(( $(date +%s) + REMAIN ))

DEVFLAG=--device_data
SEED=41
for attempt in 1 2 3 4 5 6 7 8 9 10; do
  LEFT=$(( DEADLINE - $(date +%s) ))
  [ "$LEFT" -lt 300 ] && { echo "train deadline reached"; break; }
  CHUNK=$(( LEFT < 5400 ? LEFT : 5400 ))
  $WD /tmp/r3_cond128_q18.log 900 "$CHUNK" -- \
    python -m txt2vid_tpu.train.gan \
      --G "$GC3" --D "$DC3" \
      --sent txt2vid_tpu.models.txt.Seq2Seq \
      --sent_weights out/txt_pretrain_r2/txt_final \
      --data "$DATA" \
      --anno synthetic_128x8/train/sent.pickle \
      --vocab synthetic_big/vocab.pickle \
      --frame_sizes 32 64 128 --subsample_input --num_channels 1 \
      --D_loss txt2vid_tpu.gan.losses.RSGANLoss --gp_lambda 1.0 \
      --G_lr 0.0002 --D_lr 0.0001 --G_beta2 0.999 --D_beta2 0.999 \
      --batch_size 32 --epochs 160 --seed "$SEED" --resume \
      --log_period 50 --save_model_period 1000 --save_example_period 2000 \
      --sample_batch_size 8 $DEVFLAG \
      --out out/r3_cond128_q18 --out_samples out/r3_cond128_q18/samples
  RC=$?
  [ $RC -eq 0 ] && break
  if [ $RC -eq 42 ]; then
    # NaN-abort: last checkpoint on disk predates the spike; fresh seed so
    # the resumed run diverges instead of replaying into the same spike
    SEED=$(( SEED + 1 ))
    echo "q18 attempt $attempt NAN_ABORT; rolling back with fresh seed $SEED"
    continue
  fi
  if grep -q "RESOURCE_EXHAUSTED\|Out of memory\|out of memory" /tmp/r3_cond128_q18.log; then
    echo "q18 attempt $attempt hit device OOM; falling back to host packed loader"
    DEVFLAG=""
  fi
  echo "q18 train attempt $attempt exited rc=$RC; re-probing TPU then resuming"
  wait_for_tpu || exit 1
done

# ---- alignment sweep over the checkpoint trail ----
wait_for_tpu
for IT in 6000 12000 20000 final; do
  if [ "$IT" = final ]; then
    CKPT=$(ls -td out/r3_cond128_q18/iter_* 2>/dev/null | head -1)
  else
    CKPT=$(ls -d out/r3_cond128_q18/iter_${IT}_* 2>/dev/null | head -1)
  fi
  [ -n "$CKPT" ] || continue
  $WD "/tmp/r3_align_q18_${IT}.log" 900 1500 -- \
    python -m txt2vid_tpu.eval.alignment \
      --weights "$CKPT" --G "$GC3" --D "$DC3" \
      --sent txt2vid_tpu.models.txt.Seq2Seq \
      --vocab synthetic_big/vocab.pickle \
      --frame_sizes 32 64 128 --num_frames 32 --num_channels 1 \
      --k_per_class 32 --seed 5
done

# warm the bench compile cache for the driver's end-of-round bench
$WD /tmp/r3_bench_warm.log 900 1800 -- python bench.py

echo QUEUE18_DONE
