"""TPU probe: raw per-iter grad-norm metric values, with and without in-step clip.

Context (RESULTS.md round 3): on the TPU backend the trainer's |g|D/|g|G status
chunk never appears for --clip_grad runs (queue-14 take 2, clip probe), while the
same CLI config on CPU prints it — the status print is gated on np.isfinite of
the fetched metric, so its absence means the FETCHED grad_norm metric is
non-finite even though training visibly progresses (losses trend, samples
evolve), i.e. the in-step value used for clipping and the returned metric value
disagree. This probe bypasses the trainer entirely: build the step, run k iters,
fetch metrics one step at a time, print raw floats.

Usage: python scripts/probe_gnorm_tpu.py [--clip 50] [--iters 8] [--flagship]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from txt2vid_tpu.gan import losses as L
from txt2vid_tpu.gan.cond_gan import CondGan
from txt2vid_tpu.gan.train_step import TrainConfig, build_train_step, init_state
from txt2vid_tpu.models import tganv2, tganv2_cond
from txt2vid_tpu.models.txt import Seq2Seq


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clip", type=float, default=0.0)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--flagship", action="store_true",
                   help="3-scale cond-128 production shape (batch 8 to fit "
                        "quickly); default is a small 2-scale 64px cond config")
    p.add_argument("--batch_size", type=int, default=0)
    args = p.parse_args()

    print(f"devices: {jax.devices()}")
    if args.flagship:
        b = args.batch_size or 8
        gen = tganv2_cond.MultiScaleGen(
            num_channels=1, num_frames=32, width=128, height=128,
            additional_blocks=(64, 32), fm_stride=32, remat=True)
        dis = tganv2_cond.MultiScaleDiscrim(
            num_channels=1, cond_head="proj", discrim_down_blocks=(4, 4, 4))
        frame_sizes = (32, 64, 128)
        shape = (b, 32, 128, 128, 1)
    else:
        b = args.batch_size or 16
        gen = tganv2_cond.MultiScaleGen(num_frames=16, num_channels=1)
        dis = tganv2_cond.MultiScaleDiscrim(num_channels=1)
        frame_sizes = (8, 16, 32, 64)
        shape = (b, 16, 64, 64, 1)

    enc = Seq2Seq(vocab_size=64, embed_size=128, hidden_size=128, num_layers=1)
    gan = CondGan(gen=gen, discrims=[dis], cond_encoder=enc)
    cfg = TrainConfig(frame_sizes=frame_sizes, subsample_input=True,
                      gp_lambda=1.0, clip_grad=args.clip)
    optG = optax.adam(2e-4, b1=0.5)
    optD = optax.adam(2e-4, b1=0.5)

    rng = np.random.default_rng(0)
    batch = {
        "video": jnp.asarray(rng.random(shape, np.float32)),
        "captions": jnp.asarray(rng.integers(1, 64, (shape[0], 12)), jnp.int32),
        "lengths": jnp.full((shape[0],), 12, jnp.int32),
    }
    state = init_state(gan, jax.random.key(0), batch, optG, optD, cfg)
    step = jax.jit(build_train_step(gan, L.RSGANLoss(), optG, optD, cfg),
                   donate_argnums=(0,))

    print(f"clip={args.clip} shape={shape} — per-iter raw metrics:")
    key = jax.random.key(1)
    deferred = []   # also test the trainer's batched deferred-fetch pattern
    for i in range(args.iters):
        state, m = step(state, batch, key)
        deferred.append(m)
        vals = {k: float(np.asarray(v)) for k, v in jax.device_get(m).items()}
        print(f"  iter {i + 1}: " + " ".join(
            f"{k}={vals[k]:.4f}" for k in sorted(vals)))
    host = jax.device_get(deferred)
    print("deferred batched fetch (trainer drain pattern):")
    for i, m in enumerate(host):
        vals = {k: float(np.asarray(v)) for k, v in m.items()}
        print(f"  iter {i + 1}: " + " ".join(
            f"{k}={vals[k]:.4f}" for k in sorted(vals)))


if __name__ == "__main__":
    main()
