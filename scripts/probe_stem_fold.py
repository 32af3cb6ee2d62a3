"""Measure weight-EQUIVALENT reformulations of the C=1 discriminator stem conv.

probe_c1_padding.py established the cost (the as-written C_in=1 3x3x3 stem
moves ~350x its input bytes: im2col lane padding) and that a frames->channels
fold is 4.7x faster — but that fold changes the math. This probe measures
candidates that compute the IDENTICAL function of the same (3,3,3,1,C) kernel:

  conv    — nn.Conv-equivalent lax conv (baseline, as written)
  einsum  — stack the 27 shifted taps into a (...,27) patch tensor, one
            (N,27)@(27,C) MXU matmul
  shift   — accumulate 27 shifted copies x_tap * k[tap,:] (VPU elementwise;
            XLA loop-fuses the taps)

For each: fwd and fwd+bwd (vjp wrt input AND kernel — the stem sits in the
D, so both the data path (GP) and the param path run every step), f32 and
bf16, at the probe shape (8,32,128,128,1) for continuity with
docs/r4/r8_c1_padding_probe.log plus the three real flagship pyramid scales.

Run on the TPU:  python scripts/probe_stem_fold.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

C_OUT = 64


def conv_ref(x, k):
    return lax.conv_general_dilated(
        x, k, (1, 1, 1), "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def _taps(x):
    """27 shifted views of (B,T,H,W,1) under SAME padding, as (...,27)."""
    xp = jnp.pad(x[..., 0], ((0, 0), (1, 1), (1, 1), (1, 1)))
    B, T, H, W = x.shape[:4]
    cols = [xp[:, dt:dt + T, dy:dy + H, dx:dx + W]
            for dt in range(3) for dy in range(3) for dx in range(3)]
    return jnp.stack(cols, axis=-1)


def conv_einsum(x, k):
    patches = _taps(x)
    return jnp.einsum("bthwk,kc->bthwc", patches,
                      k.reshape(27, k.shape[-1]),
                      preferred_element_type=x.dtype)


def conv_shift(x, k):
    xp = jnp.pad(x[..., 0], ((0, 0), (1, 1), (1, 1), (1, 1)))
    B, T, H, W = x.shape[:4]
    kf = k.reshape(27, k.shape[-1])
    out = jnp.zeros(x.shape[:4] + (k.shape[-1],), x.dtype)
    i = 0
    for dt in range(3):
        for dy in range(3):
            for dx in range(3):
                out = out + xp[:, dt:dt + T, dy:dy + H, dx:dx + W, None] * kf[i]
                i += 1
    return out


VARIANTS = {"conv": conv_ref, "einsum": conv_einsum, "shift": conv_shift}


def bench(fn, *args, iters=30):
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis() or {}
    out = c(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = c(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return dt, ca.get("bytes accessed", float("nan"))


def main():
    rng = np.random.default_rng(0)
    # (dtype, shape): r8 probe shape for continuity with the r4 log, plus the
    # flagship base scale (largest element count of the pyramid); one bf16 spot.
    cases = [(jnp.float32, (8, 32, 128, 128)),
             (jnp.float32, (32, 32, 32, 32)),
             (jnp.bfloat16, (8, 32, 128, 128))]
    if True:
        for dtype, (B, T, H, W) in cases:
            x = jnp.asarray(rng.standard_normal((B, T, H, W, 1)), dtype)
            k = jnp.asarray(rng.standard_normal((3, 3, 3, 1, C_OUT)), dtype) * .05
            ref = None
            for name, fn in VARIANTS.items():
                # fwd
                dt_f, by_f = bench(fn, x, k)
                # fwd+bwd: grads wrt (x, k) of a scalar-reduced output
                def loss(xx, kk):
                    return jnp.sum(fn(xx, kk).astype(jnp.float32) ** 2)
                dt_b, by_b = bench(jax.grad(loss, argnums=(0, 1)), x, k)
                y = np.asarray(jax.jit(fn)(x, k), np.float32)
                if ref is None:
                    ref = y
                    err = 0.0
                else:
                    err = float(np.max(np.abs(y - ref)) /
                                max(1e-6, float(np.max(np.abs(ref)))))
                print(f"{np.dtype(dtype).name:8s} {B:3d}x{T:3d}x{H:3d} "
                      f"{name:6s} fwd {dt_f*1e3:7.2f} ms ({by_f/1e6:8.1f} MB)"
                      f"  fwd+bwd {dt_b*1e3:7.2f} ms ({by_b/1e6:8.1f} MB)"
                      f"  relerr {err:.2e}", flush=True)
        print(flush=True)


if __name__ == "__main__":
    main()
