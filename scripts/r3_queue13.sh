#!/usr/bin/env bash
# Round-3 stage 13: PRODUCTION 3-scale fm_stride cond-128 arm.
# Queue-12 probes (r3_nan_probe.sh) all ran ~370 iters clean on the fresh
# host: A (exact queue-11 config, GP on) healthy at D~0.70/G~1.2; B (GP off)
# destabilized (G loss -> 12, D winning) => keep GP; C (4-scale regression
# check) healthy. The queue-11 NaN did not reproduce => launch the production
# arm: 260 epochs (~16.1k iters at 62 iters/epoch), checkpoints every 2k for
# the alignment sweep. Watchdog-chunked with --resume (transport can wedge).
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

GC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 32, "width": 128, "height": 128, "additional_blocks": [64, 32], "fm_stride": 32, "remat": true}}'
DC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj", "discrim_down_blocks": [4, 4, 4]}}'
DATA='{"class": "txt2vid_tpu.data.packed.packed_dataset", "args": {"data": "synthetic_128/videos.t2vc", "num_frames": 32}}'

# ~16.1k iters total; each watchdog chunk is capped at 5400s (~8k iters),
# --resume picks up from the last 2k-iter checkpoint after a kill/timeout.
for attempt in 1 2 3 4 5 6; do
  $WD /tmp/r3_cond128_3scale.log 900 5400 -- \
    python -m txt2vid_tpu.train.gan \
      --G "$GC3" --D "$DC3" \
      --sent txt2vid_tpu.models.txt.Seq2Seq \
      --sent_weights out/txt_pretrain_r2/txt_final \
      --data "$DATA" \
      --anno synthetic_128/train/sent.pickle \
      --vocab synthetic_big/vocab.pickle \
      --frame_sizes 32 64 128 --subsample_input --num_channels 1 \
      --D_loss txt2vid_tpu.gan.losses.RSGANLoss --gp_lambda 1.0 \
      --G_lr 0.0002 --D_lr 0.0002 --G_beta2 0.999 --D_beta2 0.999 \
      --batch_size 32 --epochs 260 --seed 41 --resume \
      --log_period 50 --save_model_period 2000 --save_example_period 2000 \
      --sample_batch_size 8 --device_data \
      --out out/r3_cond128_3scale --out_samples out/r3_cond128_3scale/samples
  RC=$?
  [ $RC -eq 0 ] && break
  echo "3scale train attempt $attempt exited rc=$RC; re-probing TPU then resuming"
  wait_for_tpu || exit 1
done

for IT in 4000 8000 12000 final; do
  if [ "$IT" = final ]; then
    CKPT=$(ls -td out/r3_cond128_3scale/iter_* 2>/dev/null | head -1)
  else
    CKPT=$(ls -d out/r3_cond128_3scale/iter_${IT}_* 2>/dev/null | head -1)
  fi
  [ -n "$CKPT" ] || continue
  $WD "/tmp/r3_align_3scale_${IT}.log" 900 1800 -- \
    python -m txt2vid_tpu.eval.alignment \
      --weights "$CKPT" --G "$GC3" --D "$DC3" \
      --sent txt2vid_tpu.models.txt.Seq2Seq \
      --vocab synthetic_big/vocab.pickle \
      --frame_sizes 32 64 128 --num_frames 32 --num_channels 1 \
      --k_per_class 32 --seed 5
done

# warm the bench compile cache for the driver's end-of-round bench
$WD /tmp/r3_bench_warm.log 900 1800 -- python bench.py

echo QUEUE13_DONE
