"""Pooling / resampling primitives, channel-last, jit-friendly.

These are thin wrappers over lax.reduce_window shaped to match the reference's torch
semantics (count_include_pad=True average pooling, nearest-neighbour upsampling).
"""

import numpy as np
import jax.numpy as jnp
from jax import lax


def avg_pool_3d_shape_aware(x: jnp.ndarray) -> jnp.ndarray:
    """Shape-aware 3D average pool (reference models/layers.py:197-217 DownSample).

    x: (B, T, H, W, C). For each of T/H/W: pool k=2 s=2 only if the dim is > 1, with
    both-sides padding 1 if the dim is odd; zeros from padding are included in the
    average (torch avg_pool3d count_include_pad=True default).
    """
    window = [1, 1, 1, 1, 1]
    strides = [1, 1, 1, 1, 1]
    padding = [(0, 0)] * 5
    for i, axis in enumerate((1, 2, 3)):
        size = x.shape[axis]
        if size == 1:
            continue
        window[axis] = 2
        strides[axis] = 2
        if size % 2 != 0:
            padding[axis] = (1, 1)
    summed = lax.reduce_window(x, 0.0, lax.add, window, strides, padding)
    return summed / float(np.prod(window))


def max_pool_2d(x: jnp.ndarray, k: int = 2) -> jnp.ndarray:
    """(B, H, W, C) max pool k×k stride k. Non-overlapping, so implemented as a
    reshape + max — unlike reduce_window-max this supports the double-backward the
    gradient penalty needs, and XLA fuses it better."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // k, k, w // k, k, c)
    return jnp.max(x, axis=(2, 4))


def max_pool_3d(x: jnp.ndarray, kt: int = 1, k: int = 2) -> jnp.ndarray:
    """(B, T, H, W, C) max pool (kt, k, k) stride (kt, k, k) — the reference
    Attention3d uses [1, 2, 2] (models/layers.py:57-58)."""
    b, t, h, w, c = x.shape
    x = x.reshape(b, t // kt, kt, h // k, k, w // k, k, c)
    return jnp.max(x, axis=(2, 4, 6))


def upsample_nearest_2d(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """(B, H, W, C) nearest-neighbour upsample (torch nn.Upsample default mode)."""
    x = jnp.repeat(x, factor, axis=1)
    x = jnp.repeat(x, factor, axis=2)
    return x
