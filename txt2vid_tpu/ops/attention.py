"""Non-local (self-attention) core ops.

The reference non-local blocks (models/layers.py:10-68, SA-GAN / video-nonlocal-net
style) compute, from 1x1-conv projections theta (N, d), phi (M, d), g (M, dv) with M =
N/4 after a 2x2 (or [1,2,2]) max-pool:

    beta = softmax(theta @ phi^T, axis=-1)      # (N, M) attention map, NO 1/sqrt(d)
    o    = beta @ g                             # (N, dv)

Note the reference does NOT scale logits by 1/sqrt(d) (BigGAN convention) — we preserve
that. `attention_core` is the XLA reference implementation; `attention_core_fused` is
the Pallas TPU kernel that never materializes the (N, M) map in HBM (flash-attention
style online softmax, blockwise over N and M). Both share the signature
(theta, phi, g) -> o with a leading batch dim, and gradients (custom VJP for the fused
kernel, recompute-based).
"""

import functools

import jax
import jax.numpy as jnp


def attention_core(theta: jnp.ndarray, phi: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """(B, N, d), (B, M, d), (B, M, dv) -> (B, N, dv). Unscaled softmax attention."""
    logits = jnp.einsum("bnd,bmd->bnm", theta, phi, preferred_element_type=jnp.float32)
    beta = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bnm,bmv->bnv", beta.astype(g.dtype), g,
                      preferred_element_type=jnp.float32).astype(g.dtype)


# ---------------------------------------------------------------------------
# Fused Pallas kernel (TPU). Falls back to attention_core on non-TPU backends.
# ---------------------------------------------------------------------------

def _pick_block(n: int, target: int) -> int:
    """Largest divisor of n that is <= target (block sizes must tile exactly)."""
    b = min(n, target)
    while n % b != 0:
        b -= 1
    return b


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def attention_core_fused(theta, phi, g):
    return _fused_fwd_impl(theta, phi, g)


def _fused_fwd_impl(theta, phi, g):
    from txt2vid_tpu.ops.pallas_attention import fused_attention
    return fused_attention(theta, phi, g)


def _fused_fwd(theta, phi, g):
    o = _fused_fwd_impl(theta, phi, g)
    return o, (theta, phi, g)


def _fused_bwd(res, do):
    theta, phi, g = res
    # Recompute-based backward. The (N, M) map is re-formed blockwise inside XLA;
    # for the sizes used by the non-local blocks this is fused well by XLA, and the
    # forward (the memory-bound direction during sampling) stays fused in Pallas.
    def f(args):
        t, p, gg = args
        return attention_core(t, p, gg)
    _, vjp = jax.vjp(f, (theta, phi, g))
    (dt, dp, dg), = vjp(do)
    return dt, dp, dg


attention_core_fused.defvjp(_fused_fwd, _fused_bwd)


import contextlib

_PALLAS_DISABLED = False


@contextlib.contextmanager
def no_pallas():
    """Trace-time override forcing the XLA attention path. The fused kernel's custom
    VJP defines first-order gradients only; code that needs second-order AD through
    the discriminator (the gradient penalty's double backward) traces under this."""
    global _PALLAS_DISABLED
    prev = _PALLAS_DISABLED
    _PALLAS_DISABLED = True
    try:
        yield
    finally:
        _PALLAS_DISABLED = prev


def attention_core_auto(theta, phi, g, use_pallas: bool | None = None):
    """Dispatch to the fused Pallas kernel on TPU, XLA everywhere else."""
    if _PALLAS_DISABLED:
        return attention_core(theta, phi, g)
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if use_pallas:
        return attention_core_fused(theta, phi, g)
    return attention_core(theta, phi, g)
