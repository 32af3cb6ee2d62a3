"""Forensic probe: is the cond-128 bf16 NaN algorithmic or backend-specific?

Round-4 session evidence (RESULTS.md round 7): the 3-scale cond-128 flagship
with `--bf16 --bf16_nu --bf16_params` hit the windowed NaN-abort within the
first iterations at three different seeds, while the identical f32 config
trains cleanly. Two hypotheses:
  (a) algorithmic — some term (the multiscale GP norm chain, the global-sum
      pools, BN at 128px token counts) overflows/NaNs in half precision on
      ANY backend; then a targeted f32 island fixes it and the +32% byte
      lever comes back;
  (b) backend — another instance of the known TPU D-backward fragility at
      this shape (clip-fusion miscompile family, gan/train_step.py notes);
      then only the standalone reproducer route helps.

This probe runs ONE jitted train step of the exact flagship config on the CPU
backend at a reduced batch and prints finiteness per metric, for a ladder of
arms. CPU-reproducing NaN => (a); CPU-clean => evidence for (b) at flagship
batch (run with --batch 32 to tighten).

Caveat: the probe builds the FUSED step with gp_every=1, while the flagship
runs --clip_grad_split with --gp_every 4 — a CPU-clean result excludes the
algorithmic hypothesis for the fused composition only; the exact flagship
(split-dispatch) composition could still differ, so interpret a clean ladder
as strong-but-not-total evidence for (b).

    JAX_PLATFORMS=cpu python scripts/probe_bf16_flagship_nan.py --batch 4
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_arm(name, batch, use_bf16, bf16_params, gp_lambda, clip_grad,
            frames=32, px=128, seed=0):
    import jax
    # the baked axon sitecustomize force-registers the TPU plugin and
    # overrides JAX_PLATFORMS (see __graft_entry__.dryrun_multichip) — an env
    # prefix is silently clobbered, and one run of this CPU probe was sent to
    # the TPU remote compiler and OOM-killed (2026-08-20). Pin via config.
    if os.environ.get("TXT2VID_PROBE_PLATFORM", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from txt2vid_tpu.gan import losses as L
    from txt2vid_tpu.gan.cond_gan import CondGan
    from txt2vid_tpu.gan.train_step import (TrainConfig, build_train_step,
                                            init_state_abstract)
    from txt2vid_tpu.models import tganv2_cond
    from txt2vid_tpu.models.txt import Seq2Seq
    from txt2vid_tpu.ops.optim import adam_storage

    dtype = jnp.bfloat16 if use_bf16 else None
    enc = Seq2Seq(vocab_size=32)
    gen = tganv2_cond.MultiScaleGen(
        num_channels=1, num_frames=frames, width=px, height=px,
        additional_blocks=[64, 32], fm_stride=32, remat=True, dtype=dtype)
    discrim = tganv2_cond.MultiScaleDiscrim(
        num_channels=1, cond_head="proj", discrim_down_blocks=[4, 4, 4],
        dtype=dtype)
    gan = CondGan(gen=gen, discrims=[discrim], cond_encoder=enc)
    cfg = TrainConfig(
        frame_sizes=(px // 4, px // 2, px), subsample_input=True,
        latent_size=gan.gen.latent_size, gp_lambda=gp_lambda, gp_every=1,
        clip_grad=clip_grad,
        compute_dtype=jnp.bfloat16 if bf16_params else None)
    mu = jnp.bfloat16 if use_bf16 else None
    optG = adam_storage(2e-4, b1=0.5, b2=0.999, mu_dtype=mu,
                        nu_dtype=jnp.bfloat16 if use_bf16 else None)
    optD = adam_storage(1e-4, b1=0.5, b2=0.999, mu_dtype=mu,
                        nu_dtype=jnp.bfloat16 if use_bf16 else None)

    r = np.random.default_rng(seed)
    batch_np = {
        "video": (r.integers(0, 255, (batch, frames, px, px, 1))
                  .astype(np.uint8)),
        "captions": r.integers(4, 32, (batch, 12)).astype(np.int32),
        "lengths": np.full((batch,), 12, np.int32),
    }
    state = init_state_abstract(gan, jax.random.key(seed), batch_np, optG,
                                optD, cfg)

    def rand(tree):
        return jax.tree_util.tree_map(
            lambda a: (r.standard_normal(a.shape).astype(a.dtype) * 0.02
                       if a.dtype == np.float32 and a.ndim >= 1 else a), tree)

    state = state.replace(
        g_vars={**state.g_vars, "params": rand(state.g_vars["params"])},
        d_vars=tuple({**v, "params": rand(v["params"])} for v in state.d_vars),
        txt_vars={**state.txt_vars, "params": rand(state.txt_vars["params"])})

    step = jax.jit(build_train_step(gan, L.RSGANLoss(), optG, optD, cfg),
                   donate_argnums=0)
    state, metrics = step(state, batch_np, jax.random.key(seed + 1))
    vals = {k: float(v) for k, v in metrics.items()}
    bad = [k for k, v in vals.items() if not np.isfinite(v)]
    print(f"[{name}] " + " ".join(f"{k}={v:.4g}" for k, v in sorted(vals.items()))
          + ("  NON-FINITE: " + ",".join(bad) if bad else "  all finite"),
          flush=True)
    return bad


def main():
    # This is a CPU forensic probe: force the platform BEFORE jax import.
    # (The login profile exports JAX_PLATFORMS=axon; relying on an inline
    # env prefix sent one run of this probe to the TPU remote compiler,
    # where the batch-4 cond-128 program was OOM-killed — 2026-08-20.)
    os.environ["JAX_PLATFORMS"] = os.environ.get(
        "TXT2VID_PROBE_PLATFORM", "cpu")
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--px", type=int, default=128)
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--arm", default=None,
                   help="run one arm only: "
                        "bf16_full|bf16_noclip|bf16_nogp|bf16_nocast|f32")
    args = p.parse_args()

    arms = {
        # name: (use_bf16, bf16_params, gp_lambda, clip_grad)
        "bf16_full":   (True, True, 1.0, 100.0),
        "bf16_noclip": (True, True, 1.0, 0.0),
        "bf16_nogp":   (True, True, 0.0, 0.0),
        "bf16_nocast": (True, False, 1.0, 0.0),
        "f32":         (False, False, 1.0, 0.0),
    }
    order = [args.arm] if args.arm else list(arms)
    for name in order:
        ub, bp, gl, cg = arms[name]
        try:
            run_arm(name, args.batch, ub, bp, gl, cg,
                    frames=args.frames, px=args.px)
        except Exception as e:  # shape/memory errors should not kill the ladder
            print(f"[{name}] ERROR {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
