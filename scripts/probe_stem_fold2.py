"""Stem A/B v2: conv vs einsum fwd+bwd at the REAL flagship pyramid shapes.

v1 (probe_stem_fold.py) had two flaws: (a) constant inputs — repeated
executions of an identical (executable, args) pair returned in 0.02 ms for a
5.9 GB-traffic op, i.e. some layer of the remote-execute path elides or
caches repeats, poisoning the timing; (b) it measured a 32-frame top scale,
but the subsample pyramid HALVES frames per scale — the real cond-128 stems
see (32,32,32,32), (16,16,64,64), (8,8,128,128). Here every timed iteration
derives a fresh input from a folded PRNG key inside the jitted program (RNG
cost is identical across variants, so the A/B delta stands).

Run on the TPU:  python scripts/probe_stem_fold2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.probe_stem_fold import VARIANTS

C_OUT = 64


def bench(make_fn, shape, dtype, iters=30):
    k = jnp.asarray(np.random.default_rng(0).standard_normal(
        (3, 3, 3, 1, C_OUT)), dtype) * 0.05

    def timed(seed):
        x = jax.random.normal(jax.random.fold_in(jax.random.key(0), seed),
                              shape + (1,), dtype)
        return make_fn(x, k)

    c = jax.jit(timed).lower(jnp.int32(0)).compile()
    ca = c.cost_analysis() or {}
    jax.block_until_ready(c(jnp.int32(-1)))
    t0 = time.perf_counter()
    for i in range(iters):
        out = c(jnp.int32(i))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return dt, ca.get("bytes accessed", float("nan"))


def main():
    shapes = [(32, 32, 32, 32), (16, 16, 64, 64), (8, 8, 128, 128)]
    for dtype in (jnp.float32, jnp.bfloat16):
        for shape in shapes:
            for name in ("conv", "einsum"):
                fn = VARIANTS[name]

                def fwdbwd(x, k, fn=fn):
                    return jax.grad(
                        lambda xx, kk: jnp.sum(fn(xx, kk).astype(jnp.float32)
                                               ** 2), argnums=(0, 1))(x, k)

                dt_f, by_f = bench(fn, shape, dtype)
                dt_b, by_b = bench(fwdbwd, shape, dtype)
                print(f"{np.dtype(dtype).name:8s} {str(shape):18s} {name:6s} "
                      f"fwd {dt_f*1e3:7.2f} ms ({by_f/1e6:8.1f} MB)  "
                      f"fwd+bwd {dt_b*1e3:7.2f} ms ({by_b/1e6:8.1f} MB)",
                      flush=True)
        print(flush=True)


if __name__ == "__main__":
    main()
