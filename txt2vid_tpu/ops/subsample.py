"""TGANv2 subsampling pyramid, as static-shape traced ops.

The reference's `Subsample` (models/layers.py:98-111, applied tganv2/gen.py:101-107 and
trainer.py:157-160) takes every `sn`-th batch element and every `st`-th frame starting
at a random phase `bt ~ U{0..st-1}`: `x[::sn, :, bt::st]`. Output shapes are a static
function of the config (B/sn, T/st), so under jit only the phase is traced — the frame
phase-slice becomes a reshape + dynamic index, keeping XLA shapes static.
"""

import jax
import jax.numpy as jnp


def subsample_video(x: jnp.ndarray, key, sn: int = 2, st: int = 2):
    """x: (B, T, H, W, C) -> (B//sn, T//st, H, W, C), random temporal phase.

    Requires st | T. Returns (subsampled, bt) mirroring the reference's (x, bt).
    """
    b, t = x.shape[0], x.shape[1]
    assert t % st == 0, f"frame count {t} not divisible by st={st}"
    bt = jax.random.randint(key, (), 0, st)
    x = x[::sn]
    # frames bt, bt+st, ... == index bt of the st-sized inner axis
    x = x.reshape((x.shape[0], t // st, st) + x.shape[2:])
    x = jnp.take(x, bt, axis=2)
    return x, bt


def subsample_batch_half(c: jnp.ndarray, sn: int = 2) -> jnp.ndarray:
    """Batch-only decimation, used to keep cond vectors aligned with a subsampled
    batch (reference trainer.py:160: `cond = cond[::2]`)."""
    return c[::sn]


def subsample_rect(x: jnp.ndarray, key, width: int, height: int, depth: int | None = None):
    """Random spatial (and optionally temporal) crop (reference models/layers.py:113-148
    SubsampleRect — defined but not wired into the reference train path; provided for
    parity). x: (B, H, W, C) or (B, T, H, W, C) with depth=temporal crop size."""
    if x.ndim == 4:
        kh, kw = jax.random.split(key)
        py = jax.random.randint(kh, (), 0, x.shape[1] - height + 1)
        px = jax.random.randint(kw, (), 0, x.shape[2] - width + 1)
        return jax.lax.dynamic_slice(x, (0, py, px, 0), (x.shape[0], height, width, x.shape[3]))
    assert x.ndim == 5
    kd, kh, kw = jax.random.split(key, 3)
    d = depth if depth is not None else x.shape[1]
    pz = jax.random.randint(kd, (), 0, x.shape[1] - d + 1)
    py = jax.random.randint(kh, (), 0, x.shape[2] - height + 1)
    px = jax.random.randint(kw, (), 0, x.shape[3] - width + 1)
    return jax.lax.dynamic_slice(
        x, (0, pz, py, px, 0), (x.shape[0], d, height, width, x.shape[4]))


def multiscale_pyramid(x: jnp.ndarray, cond, frame_sizes, key, subsample_input: bool):
    """Build the real-data pyramid matched to the generator's multi-scale outputs
    (reference gan/trainer.py:131-165 `multiscale_data`).

    x: (B, T, H, W, C) at the largest frame size (frame_sizes[-1]); cond: (B, D) or
    None. Scale i is x resized to frame_sizes[i]; when subsample_input, x (and cond's
    batch) are subsampled *after* each scale is emitted, so later (larger) scales see
    half the batch and half the frames of the previous one.

    Returns (xs, conds) — lists ordered smallest..largest scale; conds is None when
    cond is None.
    """
    n = len(frame_sizes)
    if n == 1:
        return [x], (None if cond is None else [cond])

    xs, conds = [], []
    for i in range(n):
        t = x.shape[1]
        if i != n - 1:
            fs = frame_sizes[i]
            resized = jax.image.resize(
                x, (x.shape[0], t, fs, fs, x.shape[4]), method="nearest")
        else:
            resized = x
        xs.append(resized)
        if cond is not None:
            conds.append(cond)
        if subsample_input and i != n - 1:
            key, sub = jax.random.split(key)
            x, _ = subsample_video(x, sub)
            if cond is not None:
                cond = subsample_batch_half(cond)
    return xs, (conds if cond is not None else None)
