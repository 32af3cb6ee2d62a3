"""Measure the gradient-penalty attention cost (VERDICT r2 weak #3).

The GP double-backward forces the XLA attention path (`no_pallas` in
gan/cond_gan.py) because the Pallas flash kernels' custom_vjp is first-order
only — so every D step of an attention-bearing config re-materializes the
(N, M) attention map inside the GP. This script quantifies that cost at the
bench (64px) and flagship (128px) discriminator shapes by timing the full
train step in three arms:

  gp0       — gp_lambda 0 (no GP at all): baseline
  gp_attn   — gp_lambda 0.5, discriminator WITH Attention3d (the real config)
  gp_noattn — gp_lambda 0.5, discriminator WITHOUT attention

(gp_attn - gp0) is the whole GP cost; (gp_attn - gp_noattn) - (attention's
first-order cost) isolates the (N, M) re-materialization. Also reports the
compiled program's peak memory when the backend exposes it.

Run on the TPU: python scripts/bench_gp_attention.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from txt2vid_tpu.utils.cache import setup_compile_cache

setup_compile_cache()  # backend-scoped (CPU runs must not pollute the TPU cache)

import jax.numpy as jnp
import numpy as np
import optax


def time_step(step, state, batch, key, warmup=3, measure=10):
    for _ in range(warmup):
        state, m = step(state, batch, key)
    float(m["loss_d"])

    def run(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = step(state, batch, key)
        float(m["loss_d"])
        return time.perf_counter() - t0

    d_short = run(3)
    d_long = run(3 + measure)
    return (d_long - d_short) / measure


def build(frame_sizes, batch, num_frames, gp_lambda, with_attn, dtype):
    from txt2vid_tpu.gan import losses as L
    from txt2vid_tpu.gan.cond_gan import CondGan
    from txt2vid_tpu.gan.train_step import (TrainConfig, build_train_step,
                                            init_state_abstract)
    from txt2vid_tpu.models import tganv2
    from txt2vid_tpu.parallel.mesh import (jit_train_step_sharded, make_mesh,
                                           shard_batch, shard_train_state)

    gen = tganv2.MultiScaleGen(num_channels=1, num_frames=num_frames,
                               width=frame_sizes[-1], height=frame_sizes[-1],
                               remat=frame_sizes[-1] >= 128, dtype=dtype)
    discrim = tganv2.MultiScaleDiscrim(num_channels=1, with_attn=with_attn,
                                       dtype=dtype,
                                       remat=frame_sizes[-1] >= 128)
    gan = CondGan(gen=gen, discrims=[discrim])
    cfg = TrainConfig(frame_sizes=frame_sizes, subsample_input=True,
                      latent_size=256, gp_lambda=gp_lambda)
    opt = optax.adam(2e-4, b1=0.5, mu_dtype=dtype)
    rng = np.random.default_rng(0)
    b = {"video": rng.standard_normal(
        (batch, num_frames, frame_sizes[-1], frame_sizes[-1], 1)
    ).clip(-1, 1).astype(np.float32)}
    state = init_state_abstract(gan, jax.random.key(0), b, opt, opt, cfg)
    r = np.random.default_rng(1)
    rand = lambda t: jax.tree_util.tree_map(
        lambda a: (r.standard_normal(a.shape).astype(a.dtype) * 0.02
                   if a.dtype == np.float32 and a.ndim >= 1 else a), t)
    state = state.replace(
        g_vars={**state.g_vars, "params": rand(state.g_vars["params"])},
        d_vars=tuple({**v, "params": rand(v["params"])} for v in state.d_vars))
    mesh = make_mesh()
    step = jit_train_step_sharded(
        build_train_step(gan, L.RSGANLoss(), opt, opt, cfg), mesh)
    state = shard_train_state(state, mesh)
    sbatch = shard_batch(b, mesh)

    mem = None
    try:
        ca = step.lower(state, sbatch, jax.random.key(1)).compile() \
            .memory_analysis()
        if ca is not None:
            mem = int(getattr(ca, "temp_size_in_bytes", 0))
    except Exception:
        pass
    return step, state, sbatch, mem


def main():
    dtype = jnp.bfloat16
    shapes = [
        ("64px/16f b40 (bench shape)", (8, 16, 32, 64), 40, 16),
        ("128px/32f b32 (flagship)", (16, 32, 64, 128), 32, 32),
    ]
    out = {}
    for name, fs, b, nf in shapes:
        row = {}
        for arm, gp, attn in [("gp0", 0.0, True),
                              ("gp_attn", 0.5, True),
                              ("gp_noattn", 0.5, False)]:
            step, state, batch, mem = build(fs, b, nf, gp, attn, dtype)
            dt = time_step(step, state, batch, jax.random.key(2))
            row[arm] = {"sec_per_step": round(dt, 4),
                        "temp_bytes": mem}
            print(f"{name} {arm}: {dt * 1e3:.1f} ms/step"
                  + (f", temp {mem / 1e9:.2f} GB" if mem else ""), flush=True)
        row["gp_total_ms"] = round(
            (row["gp_attn"]["sec_per_step"] - row["gp0"]["sec_per_step"]) * 1e3, 2)
        row["gp_attn_vs_noattn_ms"] = round(
            (row["gp_attn"]["sec_per_step"]
             - row["gp_noattn"]["sec_per_step"]) * 1e3, 2)
        out[name] = row
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
