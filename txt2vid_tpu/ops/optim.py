"""Optimizer variants with reduced-precision STATE storage.

The train step is HBM-bandwidth-bound (scripts/profile_step.py roofline): Adam's
two moment tensors are pure streaming traffic (read+write of 2x params per
step). optax.adam already supports bf16 mu (--bf16 wires it); this adds bf16
storage for the SECOND moment too — nu is read, upcast to f32, updated in f32
(the b2*nu + (1-b2)*g^2 accumulation and the sqrt are precision-sensitive), and
stored back bf16. Only the memory/bandwidth format is low-precision, not the
math.

Reference has no counterpart (torch Adam, fp32 states); this is a TPU byte
lever (VERDICT r2 item 4).
"""

from typing import Any

import jax
import jax.numpy as jnp
import optax


def _cast(tree, dtype):
    if dtype is None:
        return tree
    return jax.tree_util.tree_map(lambda x: x.astype(dtype), tree)


def scale_by_adam_storage(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                          mu_dtype: Any = None, nu_dtype: Any = None):
    """optax.scale_by_adam with independent storage dtypes for BOTH moments.
    All arithmetic runs in f32; only the stored tensors are cast."""

    def init_fn(params):
        mu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params)
        nu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=nu_dtype or p.dtype), params)
        return optax.ScaleByAdamState(count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def update_fn(updates, state, params=None):
        del params
        f32 = jnp.float32
        mu = jax.tree_util.tree_map(
            lambda g, m: b1 * m.astype(f32) + (1 - b1) * g.astype(f32),
            updates, state.mu)
        nu = jax.tree_util.tree_map(
            lambda g, v: b2 * v.astype(f32) + (1 - b2) * jnp.square(g.astype(f32)),
            updates, state.nu)
        count = state.count + 1
        bc1 = 1 - b1 ** count.astype(f32)
        bc2 = 1 - b2 ** count.astype(f32)
        new_updates = jax.tree_util.tree_map(
            lambda m, v, g: ((m / bc1) / (jnp.sqrt(v / bc2) + eps)).astype(g.dtype),
            mu, nu, updates)
        return new_updates, optax.ScaleByAdamState(
            count=count, mu=_cast(mu, mu_dtype), nu=_cast(nu, nu_dtype))

    return optax.GradientTransformation(init_fn, update_fn)


def adam_storage(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
                 eps: float = 1e-8, mu_dtype: Any = None, nu_dtype: Any = None):
    """Adam with low-precision moment STORAGE (see scale_by_adam_storage)."""
    return optax.chain(
        scale_by_adam_storage(b1=b1, b2=b2, eps=eps,
                              mu_dtype=mu_dtype, nu_dtype=nu_dtype),
        optax.scale(-learning_rate),
    )
