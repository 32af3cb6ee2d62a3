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


def _pick_block(n: int, target: int) -> int:
    b = min(n, target)
    while n % b != 0:
        b -= 1
    return b


def _attn_kernel(theta_ref, phi_ref, g_ref, o_ref, m_ref, l_ref, acc_ref, *, n_m_blocks):
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


def fused_attention(theta: jnp.ndarray, phi: jnp.ndarray, g: jnp.ndarray,
                    block_n: int = 512, block_m: int = 1024,
                    interpret: bool = False) -> jnp.ndarray:
    """(B, N, d), (B, M, d), (B, M, dv) -> (B, N, dv)."""
    b, n, d = theta.shape
    _, m, _ = phi.shape
    dv = g.shape[-1]

    bn = _pick_block(n, block_n)
    bm = _pick_block(m, block_m)
    n_m_blocks = m // bm

    grid = (b, n // bn, n_m_blocks)
    kernel = functools.partial(_attn_kernel, n_m_blocks=n_m_blocks)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bn, d), lambda bi, i, j: (bi, i, 0)),
            pl.BlockSpec((1, bm, d), lambda bi, i, j: (bi, j, 0)),
            pl.BlockSpec((1, bm, dv), lambda bi, i, j: (bi, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bn, dv), lambda bi, i, j: (bi, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, dv), g.dtype),
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
