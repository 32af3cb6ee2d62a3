"""Ring attention: sequence-sharded non-local attention over the device mesh.

The long-clip / high-resolution path (SURVEY.md §2.8, §5): when T*H*W grows past
what a single chip should hold (32-frame 128px reddit-videos), the attention tokens
are sharded over a mesh axis and the key/value blocks rotate around the ring with
`jax.lax.ppermute` (XLA lowers this to ICI neighbor exchanges), each device merging
per-block flash statistics (o, lse). Semantics are identical to
ops.attention.attention_core (unscaled logits, as the reference non-local blocks,
models/layers.py:39-68); models reach this path through the
ops.attention.sequence_parallel trace-time context.

Layout: theta (B, N, d), phi (B, M, d), g (B, M, dv), all sharded on their token axis
over `axis_name`; output (B, N, dv) sharded like theta.

Per-rotation block math runs either through the fused Pallas kernel (TPU — the
(N_loc, M_loc) tile never hits HBM) or a stable two-pass XLA softmax (CPU/tests);
partial results merge by log-sum-exp:
    lse = logaddexp(lse_a, lse_b);  o = o_a*exp(lse_a-lse) + o_b*exp(lse_b-lse).
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _block_attention_xla(theta, phi_c, g_c):
    """Stable two-pass XLA softmax block (differentiable by construction)."""
    s = jnp.einsum("bnd,bmd->bnm", theta, phi_c,
                   preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bnm,bmv->bnv", p.astype(g_c.dtype), g_c,
                   preferred_element_type=jnp.float32) / l
    return o, (m + jnp.log(l))[..., 0]


def _block_attention(theta, phi_c, g_c, use_pallas: bool):
    """One (N_loc, M_loc) attention block -> (o normalized by this block's own
    lse, lse). Differentiability of the Pallas path is provided at the
    ring_attention boundary (custom VJP with XLA-block recompute) — a custom_vjp
    INSIDE shard_map is not reverse-differentiable in current JAX."""
    if use_pallas:
        from txt2vid_tpu.ops import attention as A
        from txt2vid_tpu.ops.pallas_attention import fused_attention
        o, lse = fused_attention(theta, phi_c, g_c, return_lse=True,
                                 interpret=A.INTERPRET)
        return o.astype(jnp.float32), lse
    return _block_attention_xla(theta, phi_c, g_c)


def _merge(o_a, lse_a, o_b, lse_b):
    lse = jnp.logaddexp(lse_a, lse_b)
    wa = jnp.exp(lse_a - lse)[..., None]
    wb = jnp.exp(lse_b - lse)[..., None]
    return o_a * wa + o_b * wb, lse


def _local_ring_attention(theta, phi, g, axis_name: str, use_pallas: bool,
                          varying_axes=(), typed: bool = True):
    """Per-shard body: N_local queries attend over all M as KV blocks rotate."""
    n_dev = jax.lax.axis_size(axis_name)
    b, n_loc, _ = theta.shape
    dv = g.shape[-1]

    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def body(i, carry):
        o_run, lse_run, phi_c, g_c = carry
        o_b, lse_b = _block_attention(theta, phi_c, g_c, use_pallas)
        o_run, lse_run = _merge(o_run, lse_run, o_b, lse_b)
        # rotate KV to the next device (the final hop restores the original shard)
        phi_c = jax.lax.ppermute(phi_c, axis_name, perm)
        g_c = jax.lax.ppermute(g_c, axis_name, perm)
        return o_run, lse_run, phi_c, g_c

    # initial stats must be typed as varying over every sharded mesh axis (each
    # shard owns its own running softmax state) — fresh constants default to
    # unvarying, which would mismatch the loop-body outputs
    def varying(x):
        if not typed:   # check_vma=False shard_map: no varying-axis typing
            return x
        return jax.lax.pcast(x, (axis_name,) + tuple(varying_axes), to="varying")

    init = (
        varying(jnp.zeros((b, n_loc, dv), jnp.float32)),
        varying(jnp.full((b, n_loc), -jnp.inf, jnp.float32)),
        phi, g,
    )
    o_run, _, _, _ = jax.lax.fori_loop(0, n_dev, body, init)
    return o_run.astype(g.dtype)


@functools.lru_cache(maxsize=None)
def _ring_fns(mesh: Mesh, axis_name: str, batch_axis: str | None):
    """Per-(mesh, axis, batch_axis) shard_map + custom_vjp closures, built ONCE —
    a fresh custom_vjp per ring_attention call would rebuild (and retrace) them at
    every attention site of every trace."""
    spec = P(batch_axis, axis_name, None)

    def run(pallas: bool):
        # check_vma=False on the Pallas path: pallas_call (and its interpret
        # mode) does not propagate shard_map's varying-axis types — JAX's own
        # error message prescribes this flag as the workaround
        return jax.shard_map(
            functools.partial(_local_ring_attention, axis_name=axis_name,
                              use_pallas=pallas,
                              varying_axes=(batch_axis,) if batch_axis else (),
                              typed=not pallas),
            mesh=mesh,
            in_specs=(spec,) * 3,
            out_specs=spec,
            check_vma=not pallas,
        )

    # Pallas forward; backward = XLA-block ring recompute. The VJP boundary sits
    # OUTSIDE shard_map (custom_vjp inside shard_map is not differentiable in
    # current JAX), and the recompute stays blockwise — per-rotation
    # (N_loc, M_loc) tiles, never the full (N, M) map.
    @jax.custom_vjp
    def ring_pallas(t, p, gg):
        return run(True)(t, p, gg)

    def fwd(t, p, gg):
        return ring_pallas(t, p, gg), (t, p, gg)

    def bwd(res, do):
        t, p, gg = res
        _, vjp = jax.vjp(run(False), t, p, gg)
        return vjp(do)

    ring_pallas.defvjp(fwd, bwd)
    return run(False), ring_pallas


def ring_attention(theta, phi, g, mesh: Mesh, axis_name: str = "sp",
                   use_pallas: bool = False, batch_axis: str | None = None):
    """Sequence-sharded softmax(theta @ phi^T) @ g over `axis_name` of `mesh`.
    `batch_axis` additionally shards the leading batch dim (dp x sp meshes) — without
    it a dp-sharded activation would be all-gathered at the shard_map boundary."""
    if batch_axis is not None and theta.shape[0] % mesh.shape[batch_axis] != 0:
        batch_axis = None
    xla_fn, pallas_fn = _ring_fns(mesh, axis_name, batch_axis)
    return (pallas_fn if use_pallas else xla_fn)(theta, phi, g)
