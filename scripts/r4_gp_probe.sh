#!/usr/bin/env bash
# Round-4 opener: root-cause the post-spike wall of the 3-scale cond-128 arm.
#
# Evidence (RESULTS.md "Queue-19 outcome", round 3): resuming the flagship from
# out/r3_cond128_q18/iter_2000 walks into a params region (~120-350 iters in,
# seeds 47-50) where the D-parameter gradient is non-finite on EVERY batch while
# the forward loss, the parameters, and |g|G (which backprops through the SAME
# discriminator w.r.t. x) all stay finite. The only D-loss term absent from the
# G loss is the gradient penalty, whose theta_D-gradient is the one
# double-backward in the program. These arms discriminate the hypotheses:
#
#   arm A (--gp_every 4): GP double-backward only every 4th step. If the wall
#         is the GP, the non-finite iters land exclusively on GP steps (the
#         |g|D log shows a 1-in-4 non-finite pattern instead of a solid streak)
#         and the frozen phase cannot form.
#   arm B (--gp_lambda 0): no GP anywhere. Wall gone => GP double-backward
#         convicted. Wall persists => the D backward itself is the problem;
#         dump HLO (arm C).
#   arm C (only if B still walls): XLA_FLAGS=--xla_dump_to=/tmp/hlo_wall the
#         same resume, grab the D-backward module at the NaN iter for an
#         offline repro.
#
# Each arm needs ~500 iters (~6 min at 0.65 s/iter) past the resume point.
#
# RESULT (end of round 3, RESULTS.md "GP convicted"): arm B RAN — 750 iters
# through 2000->2750, zero non-finite fetches, rc=0. GP double-backward is
# convicted; arm C is moot.
#
# RESULT (round 4, arm A): 500 iters through 2000->2500 (session-killed, not
# aborted), zero non-finite fetches — the wall did NOT quantize to GP steps;
# with 3 of 4 steps GP-free the D keeps moving and the wall never forms
# (feedback-loop reading, RESULTS.md "gp_every-4 probe"). |g|D spiky-but-
# finite on GP steps (5k-12k clipped peaks at the x4 lazy weight). Production
# arm: scripts/r4_queue1.sh (--gp_every 4 + --gp_quarantine + split clip).
# Round-4 order was mitigation, not diagnosis:
#   1. arm A (--gp_every 4) — confirm the wall quantizes to GP steps AND
#      measure whether 1-in-4 GP is enough regularization to keep D honest
#      (arm B's D won outright: loss_D -> 0.1 by iter 2750).
#   2. GP-grad quarantine: compute the GP contribution to the D gradient as a
#      separate vjp and zero only ITS non-finite leaves (keeping the main-loss
#      gradient), so one poisoned GP step can't freeze the whole D phase.
#      Slot: gan/train_step.py:321-344 (the lazy_gp lax.cond already shows the
#      two-vjp pattern); needs a gp_only mode on gan.all_discrim_forward so the
#      GP term gets its own value_and_grad (the GP forward is on interpolates,
#      so no residuals are shared with the main loss anyway), then
#      g = g_main + per-leaf-sanitize(g_gp) + a quarantine counter metric.
#   3. f32 GP island / zero-centered GP on pooled features if (2) still walls.
#   4. XLA repro from the iter-2200 D-backward HLO in parallel if useful.
set -x
cd "$(dirname "$0")/.."
WD=scripts/run_with_watchdog.sh

GC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": {"num_channels": 1, "num_frames": 32, "width": 128, "height": 128, "additional_blocks": [64, 32], "fm_stride": 32, "remat": true}}'
DC3='{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": {"num_channels": 1, "cond_head": "proj", "discrim_down_blocks": [4, 4, 4]}}'
DATA='{"class": "txt2vid_tpu.data.packed.packed_dataset", "args": {"data": "synthetic_128x8/videos.t2vc", "num_frames": 32}}'

common() {
  python -m txt2vid_tpu.train.gan \
    --G "$GC3" --D "$DC3" \
    --sent txt2vid_tpu.models.txt.Seq2Seq \
    --sent_weights out/txt_pretrain_r2/txt_final \
    --data "$DATA" \
    --anno synthetic_128x8/train/sent.pickle \
    --vocab synthetic_big/vocab.pickle \
    --frame_sizes 32 64 128 --subsample_input --num_channels 1 \
    --D_loss txt2vid_tpu.gan.losses.RSGANLoss \
    --G_lr 0.0002 --D_lr 0.0001 --G_beta2 0.999 --D_beta2 0.999 \
    --clip_grad 100 --clip_grad_split \
    --batch_size 32 --epochs 3 --seed 61 --resume \
    --log_period 25 --save_model_period 100000 \
    --out out/r3_cond128_q18 --out_samples /tmp/r4_probe_samples \
    "$@"
}

# arm A: GP every 4th step (program change: lax.cond GP branch — cold compile)
$WD /tmp/r4_gp_probe_a.log 1200 3600 -- common --gp_lambda 1.0 --gp_every 4
# arm B: no GP (smaller program, no double-backward)
$WD /tmp/r4_gp_probe_b.log 1200 3600 -- common --gp_lambda 0.0

echo GP_PROBE_DONE  # read the two logs: non-finite pattern vs solid streak
