"""Execute (not just AOT-lower) the ring-sharded attention path at the FLAGSHIP
generator shape (VERDICT r3 item 8).

The sp>1 ring path (ops/ring_attention.py, reached from the models through the
sequence_parallel trace-time context) had executed-proof only at toy shapes;
the 32-frame/128px generator had been AOT-lowered over a (dp, sp) mesh but
never stepped. This script runs the full conditional flagship generator —
train-mode, subsample pyramid active, non-local attention at the 64px scale —
on a 2-device sp mesh on the CPU backend, forward AND backward, and prints
per-call wall times for the RESULTS entry.

Run:
  XLA_FLAGS=--xla_force_host_platform_device_count=2 \
      python scripts/r4_ring_flagship.py
(forces the CPU backend itself, like __graft_entry__.dryrun_multichip)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_compilation_cache", False)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh


def main():
    from txt2vid_tpu.models import tganv2_cond
    from txt2vid_tpu.ops.attention import sequence_parallel

    devices = jax.devices()
    assert len(devices) >= 2, "need 2 virtual devices (set XLA_FLAGS)"
    mesh = Mesh(np.array(devices[:2]), ("sp",))

    # the flagship 3-scale config (scripts/r5_chain.sh GC3): 32f/128px, pyramid
    # 32/64/128, attention at the second-to-last additional block (64px scale)
    gen = tganv2_cond.MultiScaleGen(num_channels=1, num_frames=32, width=128,
                                    height=128, additional_blocks=(64, 32),
                                    fm_stride=32, use_pallas=False)
    b = 4
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((b, gen.latent_size)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((b, 256)), jnp.float32)

    t0 = time.time()
    v = jax.jit(lambda k1, k2, zz, cc: gen.init(
        {"params": k1, "sample": k2}, zz, cond=cc, train=True))(
        jax.random.key(0), jax.random.key(1), z, cond)
    jax.block_until_ready(v)
    print(f"init: {time.time() - t0:.1f} s")

    def fwd(vv, zz, cc, key):
        outs = gen.apply(vv, zz, cond=cc, train=True, rngs={"sample": key},
                         mutable=["batch_stats"])[0]
        return outs

    def loss(params, vv, zz, cc, key):
        vv = dict(vv, params=params)
        outs = fwd(vv, zz, cc, key)
        return sum(jnp.mean(jnp.square(o)) for o in outs)

    with sequence_parallel(mesh, "sp"):
        jfwd = jax.jit(fwd)
        t0 = time.time()
        outs = jax.block_until_ready(jfwd(v, z, cond, jax.random.key(2)))
        print(f"forward compile+run: {time.time() - t0:.1f} s; pyramid "
              f"{[tuple(o.shape) for o in outs]}")
        times = []
        for i in range(3):
            t0 = time.time()
            jax.block_until_ready(jfwd(v, z, cond, jax.random.key(3 + i)))
            times.append(time.time() - t0)
        print("forward steps (s):", " ".join(f"{t:.2f}" for t in times))

        jgrad = jax.jit(jax.value_and_grad(loss))
        t0 = time.time()
        val, grads = jax.block_until_ready(
            jgrad(v["params"], v, z, cond, jax.random.key(9)))
        print(f"backward compile+run: {time.time() - t0:.1f} s; loss "
              f"{float(val):.5f}")
        t0 = time.time()
        val, grads = jax.block_until_ready(
            jgrad(v["params"], v, z, cond, jax.random.key(10)))
        gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g))
                             for g in jax.tree_util.tree_leaves(grads)))
        print(f"backward step: {time.time() - t0:.2f} s; |g| "
              f"{float(gnorm):.4f} finite={bool(jnp.isfinite(gnorm))}")
    print("RING_FLAGSHIP_OK")


if __name__ == "__main__":
    main()
