"""C=1 lane-padding probe (VERDICT r3 byte-lever item: "whether C=1 grayscale
convs are paying 128-lane padding").

The flagship discriminator stem (`models/resnet3d.py` stem_conv1) convolves a
single-channel video. TPU convs lower to MXU matmuls over (kd*kh*kw*C_in)
contractions; if XLA pads the C=1 input to a full lane/sublane tile, the stem
pays up to 8-128x the input-read bytes. This probe compiles three variants at
the flagship stem shape and reports measured time + compiled cost analysis:

  a) C=1 conv, 3x3x3 -> 64          (the flagship stem as written)
  b) C=8 conv, 3x3x3 -> 64          (what the stem would cost if channels were
                                     already lane-friendly; upper bound on harm)
  c) frame-folded stem: fold 8 frames into channels (B,T/8,H,W,8) then 3x3x3
     conv -> 64 (the candidate mitigation; changes temporal receptive field,
     so it is a measurement, not a drop-in)

Run on the TPU: python scripts/probe_c1_padding.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, T, H, W = 8, 32, 128, 128
DTYPE = jnp.float32


def bench(fn, *args, iters=20):
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis() or {}
    out = c(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = c(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return dt, ca.get("bytes accessed", float("nan")), ca.get("flops", float("nan"))


def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def main():
    rng = np.random.default_rng(0)
    k1 = jnp.asarray(rng.standard_normal((3, 3, 3, 1, 64)), DTYPE) * 0.05
    k8 = jnp.asarray(rng.standard_normal((3, 3, 3, 8, 64)), DTYPE) * 0.05
    x1 = jnp.asarray(rng.standard_normal((B, T, H, W, 1)), DTYPE)
    x8 = jnp.asarray(rng.standard_normal((B, T, H, W, 8)), DTYPE)
    xf = x1.reshape(B, T // 8, 8, H, W, 1).transpose(0, 1, 3, 4, 2, 5)
    xf = xf.reshape(B, T // 8, H, W, 8)

    for name, fn, args in [
        ("c1_stem   (B,32,128,128,1)->64", lambda x: conv(x, k1), (x1,)),
        ("c8_stem   (B,32,128,128,8)->64", lambda x: conv(x, k8), (x8,)),
        ("folded    (B,4,128,128,8)->64 ", lambda x: conv(x, k8), (xf,)),
    ]:
        dt, by, fl = bench(fn, *args)
        ideal = sum(np.prod(a.shape) * a.dtype.itemsize for a in args)
        print(f"{name}: {dt * 1e3:7.2f} ms  bytes_accessed={by / 1e6:9.1f} MB "
              f"(input ideal {ideal / 1e6:7.1f} MB)  flops={fl / 1e9:7.1f} G  "
              f"eff_bw={(by / dt) / 1e9:6.1f} GB/s")

    # HLO-level evidence: does the compiled c1 program pad the input channel dim?
    c = jax.jit(lambda x: conv(x, k1)).lower(x1).compile()
    txt = c.as_text()
    pads = [ln.strip() for ln in txt.splitlines()
            if ("pad(" in ln or "pad_" in ln) and "128,128" in ln]
    print(f"pad ops touching the input-shaped tensors: {len(pads)}")
    for ln in pads[:6]:
        print("  ", ln[:180])


if __name__ == "__main__":
    main()
