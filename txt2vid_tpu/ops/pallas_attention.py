"""Fused non-local attention as a Pallas TPU kernel.

Computes o = softmax(theta @ phi^T) @ g (unscaled logits, matching the reference
non-local blocks, models/layers.py:33,65) without materializing the (N, M) attention
map in HBM. Flash-attention-style online softmax, blockwise over both N (query rows)
and M (key/value rows); the M-axis is the innermost sequential grid dimension with
f32 running-max / running-sum / accumulator scratch carried across grid steps.

The reference implementation for parity testing is
txt2vid_tpu.ops.attention.attention_core.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _vma_of(*arrays):
    """Union of the inputs' varying-mesh-axes sets. Inside shard_map (the ring
    attention per-block call) outputs must declare how they vary over mesh axes;
    outside shard_map this is the empty set."""
    vma = set()
    for a in arrays:
        try:
            vma |= set(jax.typeof(a).vma)
        except Exception:
            pass
    return frozenset(vma)


def _pick_block(n: int, target: int) -> int:
    b = min(n, target)
    while n % b != 0:
        b -= 1
    return b


def _attn_kernel(theta_ref, phi_ref, g_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref,
                 *, n_m_blocks):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    theta = theta_ref[0]          # (BN, d)
    phi = phi_ref[0]              # (BM, d)
    g = g_ref[0]                  # (BM, dv)

    # Unscaled logits (reference applies no 1/sqrt(d)).
    s = jax.lax.dot_general(
        theta, phi, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                      # (BN, BM)

    m_prev = m_ref[:, :1]                                        # (BN, 1)
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                                       # (BN, BM)
    corr = jnp.exp(m_prev - m_new)                               # (BN, 1)
    l_new = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)

    pv = jax.lax.dot_general(
        p.astype(g.dtype), g, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                      # (BN, dv)
    acc_ref[:] = acc_ref[:] * corr + pv

    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == n_m_blocks - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)
        # log-sum-exp of each row's logits: the backward's softmax re-normalizer
        # (kept (BN, 1): TPU block shapes need the minor dims (8, 128)-tileable or
        # equal to the array dims — a trailing singleton satisfies that)
        lse_ref[0] = m_ref[:, :1] + jnp.log(l_ref[:, :1])


def fused_attention(theta: jnp.ndarray, phi: jnp.ndarray, g: jnp.ndarray,
                    block_n: int = 512, block_m: int = 1024,
                    interpret: bool = False, return_lse: bool = False):
    """(B, N, d), (B, M, d), (B, M, dv) -> (B, N, dv) [, lse (B, N) f32]."""
    b, n, d = theta.shape
    _, m, _ = phi.shape
    dv = g.shape[-1]

    bn = _pick_block(n, block_n)
    bm = _pick_block(m, block_m)
    n_m_blocks = m // bm

    grid = (b, n // bn, n_m_blocks)
    kernel = functools.partial(_attn_kernel, n_m_blocks=n_m_blocks)

    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bn, d), lambda bi, i, j: (bi, i, 0)),
            pl.BlockSpec((1, bm, d), lambda bi, i, j: (bi, j, 0)),
            pl.BlockSpec((1, bm, dv), lambda bi, i, j: (bi, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bn, dv), lambda bi, i, j: (bi, i, 0)),
            pl.BlockSpec((1, bn, 1), lambda bi, i, j: (bi, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, dv), g.dtype, vma=_vma_of(theta, phi, g)),
            jax.ShapeDtypeStruct((b, n, 1), jnp.float32,
                                 vma=_vma_of(theta, phi, g)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bn, _LANES), jnp.float32),   # running max
            pltpu.VMEM((bn, _LANES), jnp.float32),   # running sum
            pltpu.VMEM((bn, dv), jnp.float32),       # output accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * m * (d + dv),
            bytes_accessed=4 * b * (n * d + m * d + m * dv + n * dv),
            transcendentals=b * n * m,
        ),
        interpret=interpret,
    )(theta, phi, g)
    return (o, lse[..., 0]) if return_lse else o


# ---------------------------------------------------------------------------
# Flash-style backward kernels. Neither materializes the (N, M) map in HBM:
# each re-forms one (block_n, block_m) logit tile in VMEM from the saved lse.
#   dtheta = ds @ phi,  dphi = ds^T @ theta,  dg = p^T @ do
#   with p = exp(s - lse),  ds = p * (do @ g^T - delta),  delta = rowsum(do * o).
# ---------------------------------------------------------------------------

def _attn_bwd_dq_kernel(theta_ref, phi_ref, g_ref, do_ref, lse_ref, delta_ref,
                        dtheta_ref, acc_ref, *, n_m_blocks):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    theta = theta_ref[0]                                          # (BN, d)
    phi = phi_ref[0]                                              # (BM, d)
    g = g_ref[0]                                                  # (BM, dv)
    do = do_ref[0]                                                # (BN, dv)
    lse = lse_ref[0]                                              # (BN, 1)
    delta = delta_ref[0]                                          # (BN, 1)

    s = jax.lax.dot_general(theta, phi, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)   # (BN, BM)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(do, g, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (BN, BM)
    ds = p * (dp - delta)
    acc_ref[:] += jax.lax.dot_general(
        ds.astype(phi.dtype), phi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                       # (BN, d)

    @pl.when(j == n_m_blocks - 1)
    def _finalize():
        dtheta_ref[0] = acc_ref[:].astype(dtheta_ref.dtype)


def _attn_bwd_dkv_kernel(theta_ref, phi_ref, g_ref, do_ref, lse_ref, delta_ref,
                         dphi_ref, dg_ref, dphi_acc, dg_acc, *, n_n_blocks):
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        dphi_acc[:] = jnp.zeros_like(dphi_acc)
        dg_acc[:] = jnp.zeros_like(dg_acc)

    theta = theta_ref[0]                                          # (BN, d)
    phi = phi_ref[0]                                              # (BM, d)
    g = g_ref[0]                                                  # (BM, dv)
    do = do_ref[0]                                                # (BN, dv)
    lse = lse_ref[0]                                              # (BN, 1)
    delta = delta_ref[0]                                          # (BN, 1)

    s = jax.lax.dot_general(theta, phi, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)   # (BN, BM)
    p = jnp.exp(s - lse)
    dg_acc[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                       # (BM, dv)

    dp = jax.lax.dot_general(do, g, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (BN, BM)
    ds = p * (dp - delta)
    dphi_acc[:] += jax.lax.dot_general(
        ds.astype(theta.dtype), theta, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                       # (BM, d)

    @pl.when(i == n_n_blocks - 1)
    def _finalize():
        dphi_ref[0] = dphi_acc[:].astype(dphi_ref.dtype)
        dg_ref[0] = dg_acc[:].astype(dg_ref.dtype)


def fused_attention_bwd(theta, phi, g, o, lse, do,
                        block_n: int = 256, block_m: int = 512,
                        interpret: bool = False):
    """Flash backward: (residuals, do) -> (dtheta, dphi, dg), no (N, M) in HBM."""
    b, n, d = theta.shape
    _, m, _ = phi.shape
    dv = g.shape[-1]

    bn = _pick_block(n, block_n)
    bm = _pick_block(m, block_m)
    n_n_blocks = n // bn
    n_m_blocks = m // bm

    # delta = rowsum(do * o): cheap elementwise XLA, fused into do's producer
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1,
                    keepdims=True)                                # (B, N, 1)
    lse = lse[..., None] if lse.ndim == 2 else lse                # (B, N, 1)

    dtheta = pl.pallas_call(
        functools.partial(_attn_bwd_dq_kernel, n_m_blocks=n_m_blocks),
        grid=(b, n_n_blocks, n_m_blocks),
        in_specs=[
            pl.BlockSpec((1, bn, d), lambda bi, i, j: (bi, i, 0)),
            pl.BlockSpec((1, bm, d), lambda bi, i, j: (bi, j, 0)),
            pl.BlockSpec((1, bm, dv), lambda bi, i, j: (bi, j, 0)),
            pl.BlockSpec((1, bn, dv), lambda bi, i, j: (bi, i, 0)),
            pl.BlockSpec((1, bn, 1), lambda bi, i, j: (bi, i, 0)),
            pl.BlockSpec((1, bn, 1), lambda bi, i, j: (bi, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, bn, d), lambda bi, i, j: (bi, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, d), theta.dtype),
        scratch_shapes=[pltpu.VMEM((bn, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * b * n * m * d,
            bytes_accessed=4 * b * (2 * n * d + m * d + n * dv + m * dv),
            transcendentals=b * n * m,
        ),
        interpret=interpret,
    )(theta, phi, g, do, lse, delta)

    dphi, dg = pl.pallas_call(
        functools.partial(_attn_bwd_dkv_kernel, n_n_blocks=n_n_blocks),
        grid=(b, n_m_blocks, n_n_blocks),
        in_specs=[
            pl.BlockSpec((1, bn, d), lambda bi, jm, i: (bi, i, 0)),
            pl.BlockSpec((1, bm, d), lambda bi, jm, i: (bi, jm, 0)),
            pl.BlockSpec((1, bm, dv), lambda bi, jm, i: (bi, jm, 0)),
            pl.BlockSpec((1, bn, dv), lambda bi, jm, i: (bi, i, 0)),
            pl.BlockSpec((1, bn, 1), lambda bi, jm, i: (bi, i, 0)),
            pl.BlockSpec((1, bn, 1), lambda bi, jm, i: (bi, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bm, d), lambda bi, jm, i: (bi, jm, 0)),
            pl.BlockSpec((1, bm, dv), lambda bi, jm, i: (bi, jm, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, m, d), phi.dtype),
            jax.ShapeDtypeStruct((b, m, dv), g.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bm, d), jnp.float32),
            pltpu.VMEM((bm, dv), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * b * n * m * (d + dv) // 2,
            bytes_accessed=4 * b * (n * d + 2 * m * d + n * dv + 2 * m * dv),
            transcendentals=b * n * m,
        ),
        interpret=interpret,
    )(theta, phi, g, do, lse, delta)

    return dtheta, dphi, dg
