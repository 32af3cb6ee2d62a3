"""Standalone minimal reproducer for the flagship clip-fusion miscompile.

Round-3 forensics (RESULTS.md queue-14/16/17, bisect-18; gan/train_step.py
_norm_and_clip notes): on the TPU backend, the 3-scale cond-128 flagship's
discriminator backward compiles to NaN gradients when global-norm-clip
scale-and-select ops are fused into the same program, while the clip-free
program computes finite gradients from IDENTICAL inputs. Batch 8 is recovered
by an optimization_barrier between backward and clip; batch 32 miscompiles
under every clip formulation. CPU and the 64px shapes are clean.

This script is the self-contained artifact for reporting/re-testing that
backend bug: synthetic weights + synthetic inputs, NO trainer/data deps, and a
shrink ladder so the smallest triggering program/shape can be bisected.

Levels (how much of the step is in the compiled program):
  dgrad   grad of the D loss (RSGAN + multiscale GP) w.r.t. D params only —
          no generator, no encoder, no optimizer. Clip math implemented
          LOCALLY (fused / barrier / off) so nothing else is in the program.
  dstep   dgrad + the Adam update applied to the D params.
  full    the real build_train_step program (G + D + both optimizers), clip
          via TrainConfig.clip_grad; arm 'fused' sets TXT2VID_CLIP_NO_BARRIER.

Arms: off (no clip — negative control), fused (clip, no barrier — the
bisect-18 trigger), barrier (clip behind optimization_barrier).

Single run (one process = one compiled program — REQUIRED for a clean repro):
    python scripts/repro_clip_miscompile.py --level dgrad --arm fused \
        --batch 32 --frames 32 --px 128 --iters 4
Prints one JSON line: {"level", "arm", "shape", "finite", "norms", ...}.

Sweep (subprocess per cell; writes a summary table):
    python scripts/repro_clip_miscompile.py --sweep [--xla_flags "..."] ...

XLA-flag suppression probe: pass e.g.
    --xla_flags "--xla_disable_hlo_passes=fusion"
to test whether disabling a fusion pass suppresses the miscompile (the script
just exports XLA_FLAGS before backend init).
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_single(args):
    if args.xla_flags:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " "
                                   + args.xla_flags).strip()
    if args.level == "full" and args.arm == "fused":
        os.environ["TXT2VID_CLIP_NO_BARRIER"] = "1"

    import jax
    if args.cpu:
        # the baked sitecustomize force-registers the TPU plugin and clobbers
        # JAX_PLATFORMS=cpu; only the in-process config update is honored
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from txt2vid_tpu.gan import losses as L
    from txt2vid_tpu.gan.cond_gan import CondGan
    from txt2vid_tpu.models import tganv2_cond

    # flagship discriminator (scripts/r5_chain.sh DC3), parameterized for bisection
    blocks = tuple(int(b) for b in args.blocks.split(","))
    dis = tganv2_cond.MultiScaleDiscrim(num_channels=1, cond_head="proj",
                                        discrim_down_blocks=blocks,
                                        cond_dim=args.cond_dim)
    n_scales = len(blocks)
    sizes = [args.px // (2 ** (n_scales - 1 - i)) for i in range(n_scales)]

    rng = np.random.default_rng(0)

    def pyramid(scale_seed):
        """Synthetic input pyramid with the subsample shape schedule: each finer
        scale halves batch and frames (ops/subsample.py semantics)."""
        r = np.random.default_rng(scale_seed)
        scales = []
        b, t = args.batch, args.frames
        for i, s in enumerate(sizes):
            scales.append(jnp.asarray(
                r.standard_normal((b, t, s, s, 1)).astype(np.float32).clip(-1, 1)))
            if i + 1 < n_scales:
                b = max(1, b // 2)
                t = max(1, t // 2)
        # reference order: scale 0 = full batch/frames at the SMALLEST size
        return scales

    real_scales = pyramid(1)
    fake_scales = pyramid(2)
    conds = [jnp.asarray(rng.standard_normal((x.shape[0], args.cond_dim))
                         .astype(np.float32)) for x in real_scales]
    fake_conds = [jnp.asarray(rng.standard_normal((x.shape[0], args.cond_dim))
                              .astype(np.float32)) for x in real_scales]

    loss = L.RSGANLoss()
    gan = CondGan(gen=_DummyGen(), discrims=[dis])

    if args.level in ("dgrad", "dstep"):
        d_vars = jax.jit(lambda k: dis.init(k, real_scales, cond=conds))(
            jax.random.key(0))

        def d_loss(params, key):
            dv = {**d_vars, "params": params}
            l, _, _ = gan.discrim_forward(
                0, dv, real_scales=real_scales, fake_scales=fake_scales,
                cond_scales=conds, fake_cond_scales=fake_conds, loss=loss,
                gp_lambda=args.gp_lambda, gp_key=key, train=True)
            return l

        opt = optax.adam(1e-4, b1=0.5)
        opt_state = jax.jit(opt.init)(d_vars["params"])

        def one_iter(params, opt_state, key):
            grads = jax.grad(d_loss)(params, key)
            # local clip, exactly the _norm_and_clip math, barrier switchable
            if args.arm == "barrier":
                grads = jax.lax.optimization_barrier(grads)
            norm = optax.global_norm(grads)
            if args.arm in ("fused", "barrier"):
                finite = jnp.isfinite(norm)
                scale = jnp.where(
                    finite, jnp.minimum(1.0, args.clip / jnp.maximum(norm, 1e-20)),
                    0.0)
                grads = jax.tree.map(
                    lambda g: jnp.where(finite, g * scale, jnp.zeros_like(g)),
                    grads)
            if args.level == "dstep":
                updates, opt_state = opt.update(grads, opt_state)
                params = optax.apply_updates(params, updates)
            return params, opt_state, norm

        step = jax.jit(one_iter, donate_argnums=(0, 1))
        params = d_vars["params"]
        norms = []
        for i in range(args.iters):
            params, opt_state, norm = step(params, opt_state,
                                           jax.random.key(10 + i))
            norms.append(float(norm))
    else:   # full
        from txt2vid_tpu.gan.train_step import (TrainConfig, build_train_step,
                                                init_state)
        from txt2vid_tpu.models.txt import Seq2Seq

        gen = tganv2_cond.MultiScaleGen(
            num_channels=1, num_frames=args.frames, width=args.px,
            height=args.px, additional_blocks=(64, 32), fm_stride=32, remat=True)
        enc = Seq2Seq(vocab_size=64, embed_size=128, hidden_size=128,
                      num_layers=1)
        fgan = CondGan(gen=gen, discrims=[dis], cond_encoder=enc)
        cfg = TrainConfig(frame_sizes=tuple(sizes), subsample_input=True,
                          gp_lambda=args.gp_lambda,
                          clip_grad=args.clip if args.arm != "off" else 0.0)
        optG = optax.adam(2e-4, b1=0.5)
        optD = optax.adam(1e-4, b1=0.5)
        batch = {
            "video": jnp.asarray(rng.random(
                (args.batch, args.frames, args.px, args.px, 1), np.float32)),
            "captions": jnp.asarray(rng.integers(1, 64, (args.batch, 12)),
                                    jnp.int32),
            "lengths": jnp.full((args.batch,), 12, jnp.int32),
        }
        state = init_state(fgan, jax.random.key(0), batch, optG, optD, cfg)
        step = jax.jit(build_train_step(fgan, loss, optG, optD, cfg),
                       donate_argnums=(0,))
        norms = []
        for i in range(args.iters):
            state, m = step(state, batch, jax.random.key(1))
            norms.append(float(m["grad_norm_d"]))

    import numpy as np
    finite = bool(np.all(np.isfinite(norms)))
    print(json.dumps({
        "level": args.level, "arm": args.arm, "clip": args.clip,
        "gp_lambda": args.gp_lambda,
        "shape": [args.batch, args.frames, args.px], "blocks": args.blocks,
        "device": str(jax.devices()[0].device_kind),
        "xla_flags": args.xla_flags or None,
        "finite": finite, "norms_d": [round(n, 3) for n in norms],
    }))
    return finite


class _DummyGen:
    """CondGan requires a gen; the dgrad/dstep levels never call it."""
    latent_size = 256


def run_sweep(args):
    """Subprocess-per-cell sweep: levels x arms at the given shape, then a
    batch-shrink ladder on the first triggering (level, arm)."""
    base = [sys.executable, os.path.abspath(__file__)]

    def cell(level, arm, batch, frames, px, xla_flags=""):
        cmd = base + ["--level", level, "--arm", arm, "--batch", str(batch),
                      "--frames", str(frames), "--px", str(px),
                      "--blocks", args.blocks, "--iters", str(args.iters),
                      "--clip", str(args.clip), "--gp_lambda",
                      str(args.gp_lambda)]
        if xla_flags:
            cmd += ["--xla_flags", xla_flags]
        if args.cpu:
            cmd += ["--cpu"]
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=args.cell_timeout)
        line = [l for l in r.stdout.strip().splitlines()
                if l.startswith("{")]
        out = json.loads(line[-1]) if line else {"error": r.stderr[-500:],
                                                 "rc": r.returncode}
        out.update({"level": level, "arm": arm,
                    "shape": [batch, frames, px]})
        print(json.dumps(out), flush=True)
        return out

    results = []
    for level in ("dgrad", "dstep", "full"):
        for arm in ("off", "fused", "barrier"):
            results.append(cell(level, arm, args.batch, args.frames, args.px))

    # shrink ladder on the smallest triggering cell, if any
    trig = next((r for r in results
                 if r.get("finite") is False and r["arm"] != "off"), None)
    if trig:
        level, arm = trig["level"], trig["arm"]
        for b in (16, 8, 4):
            results.append(cell(level, arm, b, args.frames, args.px))
        for px in (64, 32):
            results.append(cell(level, arm, args.batch, args.frames, px))
        if args.xla_flags_sweep:
            for fl in args.xla_flags_sweep.split(";"):
                results.append(cell(level, arm, args.batch, args.frames,
                                    args.px, xla_flags=fl.strip()))
    print("SWEEP SUMMARY")
    for r in results:
        print(f"  {r.get('level')}/{r.get('arm')} shape={r.get('shape')} "
              f"xla={r.get('xla_flags')} -> "
              f"{'FINITE' if r.get('finite') else 'NONFINITE' if r.get('finite') is False else 'ERROR'}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--level", choices=("dgrad", "dstep", "full"),
                   default="dgrad")
    p.add_argument("--arm", choices=("off", "fused", "barrier"),
                   default="fused")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--px", type=int, default=128)
    p.add_argument("--blocks", default="4,4,4")
    p.add_argument("--cond_dim", type=int, default=256)
    p.add_argument("--clip", type=float, default=50.0)
    p.add_argument("--gp_lambda", type=float, default=1.0)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--xla_flags", default="")
    p.add_argument("--sweep", action="store_true")
    p.add_argument("--xla_flags_sweep", default="",
                   help="';'-separated XLA_FLAGS strings for the suppression probe")
    p.add_argument("--cell_timeout", type=int, default=1800)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (sanity: everything finite)")
    args = p.parse_args()
    if args.sweep:
        run_sweep(args)
    else:
        run_single(args)


if __name__ == "__main__":
    main()
