#!/usr/bin/env bash
# Round-3 stage 14: PRODUCTION 3-scale fm_stride cond-128 arm, take 2.
# Queue-13 forensics: attempt 1 trained healthy (D grad norm 1-45) until a
# spike to 332 at iter ~1775 -> NaN; the rest of the queue died on transport
# wedges at the dataset upload. Fixes in this take:
#   * --clip_grad 50 (threshold chosen from the measured healthy-norm band;
#     grad_norm_d/g are now first-class metrics so the log shows clipping)
#   * 8k-video synthetic_128x8 dataset (matches the proven 64px recipe's
#     data scale; queue-13 used the 2k-video set)
#   * hard wall-clock deadline so alignment evals + bench warm still run
#     before the round ends, whatever the training loop does.
set -x
cd "$(dirname "$0")/.."
WD=scripts/run_with_watchdog.sh

DEADLINE=$(( $(date +%s) + ${TRAIN_BUDGET_S:-9600} ))

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

GC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 32, "width": 128, "height": 128, "additional_blocks": [64, 32], "fm_stride": 32, "remat": true}}'
DC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj", "discrim_down_blocks": [4, 4, 4]}}'
DATA='{"class": "txt2vid_tpu.data.packed.packed_dataset", "args": {"data": "synthetic_128x8/videos.t2vc", "num_frames": 32}}'

# 250 iters/epoch at batch 32 over 8k videos; 56 epochs = 14k iters, but the
# deadline below is the real stop. Checkpoints every 2k for the alignment
# sweep; --resume continues from the last one after any kill.
# The 8k packed set is 4.2GB resident in HBM under --device_data; if that
# plus the training working set exhausts the 16GB chip, drop to the host
# packed loader (same data, ~16MB/iter H2D) instead of shrinking the data.
DEVFLAG=--device_data
for attempt in 1 2 3 4 5 6 7 8; do
  REMAIN=$(( DEADLINE - $(date +%s) ))
  [ "$REMAIN" -lt 300 ] && { echo "train deadline reached"; break; }
  CHUNK=$(( REMAIN < 5400 ? REMAIN : 5400 ))
  $WD /tmp/r3_cond128_q14.log 900 "$CHUNK" -- \
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
      --batch_size 32 --epochs 56 --seed 41 --resume \
      --log_period 50 --save_model_period 2000 --save_example_period 2000 \
      --sample_batch_size 8 $DEVFLAG \
      --out out/r3_cond128_q14 --out_samples out/r3_cond128_q14/samples
  RC=$?
  [ $RC -eq 0 ] && break
  if grep -q "RESOURCE_EXHAUSTED\|Out of memory\|out of memory" /tmp/r3_cond128_q14.log; then
    echo "q14 attempt $attempt hit device OOM; falling back to host packed loader"
    DEVFLAG=""
  fi
  echo "q14 train attempt $attempt exited rc=$RC; re-probing TPU then resuming"
  wait_for_tpu || exit 1
done

for IT in 6000 10000 final; do
  if [ "$IT" = final ]; then
    CKPT=$(ls -td out/r3_cond128_q14/iter_* 2>/dev/null | head -1)
  else
    CKPT=$(ls -d out/r3_cond128_q14/iter_${IT}_* 2>/dev/null | head -1)
  fi
  [ -n "$CKPT" ] || continue
  $WD "/tmp/r3_align_q14_${IT}.log" 900 1500 -- \
    python -m txt2vid_tpu.eval.alignment \
      --weights "$CKPT" --G "$GC3" --D "$DC3" \
      --sent txt2vid_tpu.models.txt.Seq2Seq \
      --vocab synthetic_big/vocab.pickle \
      --frame_sizes 32 64 128 --num_frames 32 --num_channels 1 \
      --k_per_class 32 --seed 5
done

# warm the bench compile cache for the driver's end-of-round bench
$WD /tmp/r3_bench_warm.log 900 1800 -- python bench.py

echo QUEUE14_DONE
