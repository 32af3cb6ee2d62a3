"""Byte audit for the bf16-BN-statistics lever (VERDICT r3 item 6).

BatchNorm running statistics are per-channel vectors; if their total footprint
is KB against the step's ~23 GB of HBM traffic (RESULTS.md step profile), the
lever is sub-noise and a hardware measurement cannot resolve it. This script
counts the actual bytes in the bench state's `batch_stats` collections (and,
for context, params and per-step traffic) so the lever can be closed with
arithmetic instead of a 10-minute compile.

Run CPU-only: JAX_PLATFORMS=cpu python scripts/audit_bn_bytes.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np
import optax


def tree_bytes(tree):
    return sum(np.prod(a.shape) * a.dtype.itemsize
               for a in jax.tree_util.tree_leaves(tree))


def main():
    from txt2vid_tpu.gan import losses as L  # noqa: F401
    from txt2vid_tpu.gan.cond_gan import CondGan
    from txt2vid_tpu.gan.train_step import TrainConfig, init_state_abstract
    from txt2vid_tpu.models import tganv2_cond
    from txt2vid_tpu.models.txt import Seq2Seq

    enc = Seq2Seq(vocab_size=64)
    gen = tganv2_cond.MultiScaleGen(num_frames=16, dtype=jnp.bfloat16)
    discrim = tganv2_cond.MultiScaleDiscrim(dtype=jnp.bfloat16)
    gan = CondGan(gen=gen, discrims=[discrim], cond_encoder=enc)
    cfg = TrainConfig(frame_sizes=(8, 16, 32, 64), subsample_input=True,
                      latent_size=256)
    batch = {
        "video": np.zeros((40, 16, 64, 64, 3), np.float32),
        "captions": np.zeros((40, 12), np.int32),
        "lengths": np.full((40,), 12, np.int32),
    }
    optG = optax.adam(2e-4)
    optD = optax.adam(2e-4)
    state = init_state_abstract(gan, jax.random.key(0), batch, optG, optD, cfg)

    def stats_of(v):
        return v.get("batch_stats", {})

    bn = (tree_bytes(stats_of(state.g_vars))
          + sum(tree_bytes(stats_of(v)) for v in state.d_vars)
          + tree_bytes(stats_of(state.txt_vars)))
    params = (tree_bytes(state.g_vars.get("params", {}))
              + sum(tree_bytes(v.get("params", {})) for v in state.d_vars)
              + tree_bytes(state.txt_vars.get("params", {})))
    step_traffic = 23.3e9  # bf16 step, compiled cost analysis (RESULTS.md)
    print(f"batch_stats bytes (f32):        {bn:,}")
    print(f"params bytes:                   {params:,}")
    print(f"per-step HBM traffic (bf16):    {step_traffic:,.0f}")
    # the lever halves BN-stat read+write traffic once per step (f32->bf16)
    savings = bn / 2 + bn / 2  # f32->bf16 saves bn/2 on the read + bn/2 on the write
    print(f"bf16-BN-stats ceiling saving:   {savings:,} bytes/step "
          f"= {savings / step_traffic * 100:.5f}% of step traffic")


if __name__ == "__main__":
    main()
