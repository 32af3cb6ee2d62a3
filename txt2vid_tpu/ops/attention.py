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


# Set True (e.g. by tests) to run the Pallas kernels in interpreter mode on CPU.
INTERPRET = False


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def attention_core_fused(theta, phi, g):
    return _fused_fwd_impl(theta, phi, g)


def _fused_fwd_impl(theta, phi, g):
    from txt2vid_tpu.ops.pallas_attention import fused_attention
    return fused_attention(theta, phi, g, interpret=INTERPRET)


def _fused_fwd(theta, phi, g):
    from txt2vid_tpu.ops.pallas_attention import fused_attention
    o, lse = fused_attention(theta, phi, g, return_lse=True, interpret=INTERPRET)
    return o, (theta, phi, g, o, lse)


def _fused_bwd(res, do):
    # Flash-style Pallas backward: re-forms (block_n, block_m) logit tiles in VMEM
    # from the saved row log-sum-exp; the (N, M) map never exists in HBM in either
    # direction (the reference materializes it every forward, models/layers.py:60-67).
    theta, phi, g, o, lse = res
    from txt2vid_tpu.ops.pallas_attention import fused_attention_bwd
    return fused_attention_bwd(theta, phi, g, o, lse, do, interpret=INTERPRET)


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


_SEQ_CTX = None  # (mesh, axis_name) | None


@contextlib.contextmanager
def sequence_parallel(mesh, axis_name: str = "sp", batch_axis: str | None = "auto"):
    """TRACE-TIME context: while active, attention_core_auto dispatches to the
    ICI ring-attention kernel (ops/ring_attention.py), sharding the token axis over
    `axis_name` of `mesh`. Wrap the code that TRACES the model (the first call of a
    jitted function, or trainer.train for the training CLI) — this is a tracing
    decision, not a runtime one. The long-clip/high-res path for configs whose
    T*H*W attention exceeds one chip (SURVEY.md §2.8; run_reddit.sh).
    batch_axis="auto" co-shards the batch dim over a "dp" mesh axis if present."""
    global _SEQ_CTX
    if batch_axis == "auto":
        batch_axis = "dp" if "dp" in mesh.axis_names else None
    prev = _SEQ_CTX
    _SEQ_CTX = (mesh, axis_name, batch_axis)
    try:
        yield
    finally:
        _SEQ_CTX = prev


def attention_core_auto(theta, phi, g, use_pallas: bool | None = None):
    """Dispatch: ring attention under a sequence_parallel context, else the fused
    Pallas kernel on TPU, else plain XLA. no_pallas (the GP double-backward, which
    needs second-order AD) forces the plain XLA path over everything."""
    if _PALLAS_DISABLED:
        return attention_core(theta, phi, g)
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if _SEQ_CTX is not None:
        mesh, axis, batch_axis = _SEQ_CTX
        n_dev = mesh.shape[axis]
        if theta.shape[1] % n_dev == 0 and phi.shape[1] % n_dev == 0:
            from txt2vid_tpu.ops.ring_attention import ring_attention
            return ring_attention(theta, phi, g, mesh, axis,
                                  use_pallas=bool(use_pallas),
                                  batch_axis=batch_axis)
        # token axes not divisible by the sp axis: fall through to single-shard
    if use_pallas:
        return attention_core_fused(theta, phi, g)
    return attention_core(theta, phi, g)
