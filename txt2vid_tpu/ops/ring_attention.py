"""Ring attention: sequence-sharded non-local attention over the device mesh.

The stretch path for long-clip / high-resolution configs (SURVEY.md §2.8, §5): when
T*H*W grows past what a single chip should hold (32-frame 128px reddit-videos), the
attention tokens are sharded over a mesh axis and the key/value blocks rotate around
the ring with `jax.lax.ppermute` (XLA lowers this to ICI neighbor exchanges), each
device maintaining flash-style online-softmax statistics. Semantics are identical to
ops.attention.attention_core (unscaled logits, as the reference non-local blocks).

Layout: theta (B, N, d), phi (B, M, d), g (B, M, dv), all sharded on their token axis
over `axis_name`; output (B, N, dv) sharded like theta.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _local_ring_attention(theta, phi, g, axis_name: str):
    """Per-shard body: N_local queries attend over all M as KV blocks rotate."""
    n_dev = jax.lax.axis_size(axis_name)
    b, n_loc, d = theta.shape
    dv = g.shape[-1]

    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def body(i, carry):
        m_run, l_run, acc, phi_c, g_c = carry
        s = jnp.einsum("bnd,bmd->bnm", theta, phi_c,
                       preferred_element_type=jnp.float32)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_run, m_cur)
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_run - m_new)
        l_new = l_run * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.einsum("bnm,bmv->bnv", p.astype(g_c.dtype), g_c,
                        preferred_element_type=jnp.float32)
        acc = acc * corr + pv
        # rotate KV to the next device; skip the final (wasted) hop
        phi_c = jax.lax.ppermute(phi_c, axis_name, perm)
        g_c = jax.lax.ppermute(g_c, axis_name, perm)
        return m_new, l_new, acc, phi_c, g_c

    # initial stats must be typed as varying over the mesh axis (each shard owns its
    # own running softmax state) — fresh constants default to unvarying
    def varying(x):
        return jax.lax.pcast(x, (axis_name,), to="varying")

    init = (
        varying(jnp.full((b, n_loc, 1), -jnp.inf, jnp.float32)),
        varying(jnp.zeros((b, n_loc, 1), jnp.float32)),
        varying(jnp.zeros((b, n_loc, dv), jnp.float32)),
        phi, g,
    )
    m_run, l_run, acc, _, _ = jax.lax.fori_loop(0, n_dev, body, init)
    return (acc / l_run).astype(g.dtype)


def ring_attention(theta, phi, g, mesh: Mesh, axis_name: str = "sp"):
    """Sequence-sharded softmax(theta @ phi^T) @ g over `axis_name` of `mesh`."""
    fn = jax.shard_map(
        functools.partial(_local_ring_attention, axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(None, axis_name, None),) * 3,
        out_specs=P(None, axis_name, None),
    )
    return fn(theta, phi, g)
