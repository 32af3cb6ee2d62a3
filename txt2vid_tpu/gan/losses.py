"""GAN loss zoo (reference txt2vid/gan/losses.py) + gradient penalty.

Every loss exposes `discrim_loss(fake=..., real=...)` / `gen_loss(fake=..., real=...)`
over raw logits, exactly as the reference. Loss semantics preserved with the
reference's documented fixes (SURVEY.md §7):
  * RaSGANLoss had a fatal `self.fake_labels` typo (losses.py:95-109) — fixed here.
  * LabelledGanLoss silently swapped its real/fake label assignment (losses.py:26-27).
    For VanillaGanLoss the swap merely inverts the (symmetric) 0/1 convention, so we
    use the standard real=1/fake=0. For HingeGanLoss the swap is what made the loss
    directionally correct (with "fixed" labels the D objective would push real logits
    DOWN); we therefore implement the reference's *effective* hinge math:
    D: mean(relu(margin - real)) + mean(fake),  G: mean(relu(margin - fake)).
"""

import jax.numpy as jnp
import optax


def _f32(x):
    return x.astype(jnp.float32)


def _bce_logits(logits, labels):
    return jnp.mean(optax.sigmoid_binary_cross_entropy(_f32(logits), labels))


class MixedGanLoss:
    """Separate G and D losses (reference losses.py:8-17)."""

    def __init__(self, g_loss=None, d_loss=None):
        self.g_loss = g_loss
        self.d_loss = d_loss

    def discrim_loss(self, fake=None, real=None):
        return self.d_loss.discrim_loss(fake=fake, real=real)

    def gen_loss(self, fake=None, real=None):
        return self.g_loss.gen_loss(fake=fake, real=real)


class VanillaGanLoss:
    """Non-saturating BCE GAN loss (reference losses.py:41-46, label convention
    normalized to real=1/fake=0 — see module docstring)."""

    def __init__(self, bce_loss=True, reduction="mean"):
        assert bce_loss, "CrossEntropy variant not supported (binary logits)"

    def discrim_loss(self, fake=None, real=None):
        return _bce_logits(fake, jnp.zeros_like(fake)) + _bce_logits(real, jnp.ones_like(real))

    def gen_loss(self, fake=None, real=None):
        return _bce_logits(fake, jnp.ones_like(fake))


class HingeGanLoss:
    """Reference-effective hinge (losses.py:48-52 through the label swap; see module
    docstring)."""

    def __init__(self, margin=2.0):
        self.margin = margin

    def discrim_loss(self, fake=None, real=None):
        return jnp.mean(jnp.maximum(0.0, self.margin - _f32(real))) + jnp.mean(_f32(fake))

    def gen_loss(self, fake=None, real=None):
        return jnp.mean(jnp.maximum(0.0, self.margin - _f32(fake)))


class WassersteinGanLoss:
    """WGAN critic losses (reference losses.py:55-68); pair with gradient_penalty."""

    def discrim_loss(self, fake=None, real=None):
        return -(jnp.mean(_f32(real)) - jnp.mean(_f32(fake)))

    def gen_loss(self, fake=None, real=None):
        return -jnp.mean(_f32(fake))


class RSGANLoss:
    """Relativistic standard GAN (reference losses.py:74-85):
    D: BCE(real - fake, 1);  G: BCE(fake - real, 1)."""

    def __init__(self, bce_loss=True):
        assert bce_loss

    def discrim_loss(self, fake=None, real=None):
        d = real - fake
        return _bce_logits(d, jnp.ones_like(d))

    def gen_loss(self, fake=None, real=None):
        d = fake - real
        return _bce_logits(d, jnp.ones_like(d))


class RaSGANLoss:
    """Relativistic average GAN (reference losses.py:87-110, typo fixed)."""

    def __init__(self, bce_loss=True):
        assert bce_loss

    def discrim_loss(self, fake=None, real=None):
        a = real - jnp.mean(fake)
        b = fake - jnp.mean(real)
        return (_bce_logits(a, jnp.ones_like(a)) + _bce_logits(b, jnp.zeros_like(b))) / 2

    def gen_loss(self, fake=None, real=None):
        a = real - jnp.mean(fake)
        b = fake - jnp.mean(real)
        return (_bce_logits(a, jnp.zeros_like(a)) + _bce_logits(b, jnp.ones_like(b))) / 2


class RaLSGANLoss:
    """Relativistic average least-squares GAN (reference losses.py:113-133)."""

    def discrim_loss(self, fake=None, real=None):
        fake, real = _f32(fake), _f32(real)
        loss = jnp.mean((real - jnp.mean(fake) - 1.0) ** 2)
        loss += jnp.mean((fake - jnp.mean(real) + 1.0) ** 2)
        return loss / 2

    def gen_loss(self, fake=None, real=None):
        fake, real = _f32(fake), _f32(real)
        loss = jnp.mean((real - jnp.mean(fake) + 1.0) ** 2)
        loss += jnp.mean((fake - jnp.mean(real) - 1.0) ** 2)
        return loss / 2


# ---------------------------------------------------------------------------
# Gradient penalty (reference losses.py:135-209)
# ---------------------------------------------------------------------------

def _interpolate(alpha, real, fake):
    return alpha * real + (1.0 - alpha) * fake


def gradient_penalty(d_fn, key, real_x, fake_x, real_xbar=None, fake_xbar=None,
                     real_cond=None, fake_cond=None, zero_center=False,
                     combine="mean"):
    """WGAN-GP on alpha-interpolated inputs (reference losses.py:135-186).

    d_fn(x, cond, xbar) -> (uncond_logit, cond_logit | None). alpha is one uniform
    sample per batch element, shared across x/xbar/cond. As in the reference
    (losses.py:178: grad(...)[0]), the norm is of the gradient w.r.t. the
    interpolated x ONLY. zero_center selects ||g||^2 (R1-style) vs (||g||-1)^2.
    """
    import jax

    b = real_x.shape[0]
    alpha = jax.random.uniform(key, (b,) + (1,) * (real_x.ndim - 1))
    ix = _interpolate(alpha, real_x, fake_x)

    ixbar = None
    if real_xbar is not None and fake_xbar is not None:
        a = alpha.reshape((b,) + (1,) * (real_xbar.ndim - 1))
        ixbar = _interpolate(a, real_xbar, fake_xbar)

    icond = None
    if real_cond is not None and fake_cond is not None:
        a = alpha.reshape((b,) + (1,) * (real_cond.ndim - 1))
        icond = _interpolate(a, real_cond, fake_cond)

    def scalar_out(x):
        uncond, cond_out = d_fn(x, icond, ixbar)
        total = 0.0
        if uncond is not None:
            total = total + jnp.sum(uncond)
        if cond_out is not None:
            total = total + jnp.sum(cond_out)
        return total

    grads = jax.grad(scalar_out)(ix).astype(jnp.float32)
    norms = jnp.sqrt(jnp.sum(grads.reshape(b, -1) ** 2, axis=1) + 1e-12)
    per_sample = norms ** 2 if zero_center else (norms - 1.0) ** 2
    return jnp.sum(per_sample) if combine == "sum" else jnp.mean(per_sample)


def multiscale_gradient_penalty(d_fn_for_scale, key, real_xs, fake_xs,
                                real_xbars=None, fake_xbars=None,
                                real_conds=None, fake_conds=None):
    """Per-scale zero-centered sum-combined GP, summed over scales (reference
    losses.py:188-207: the `sub_discrims` dispatch path).

    d_fn_for_scale(i) -> d_fn for scale i."""
    import jax

    total = 0.0
    keys = jax.random.split(key, len(real_xs))
    for i in range(len(real_xs)):
        total = total + gradient_penalty(
            d_fn_for_scale(i), keys[i],
            real_x=real_xs[i], fake_x=fake_xs[i],
            real_xbar=None if real_xbars is None else real_xbars[i],
            fake_xbar=None if fake_xbars is None else fake_xbars[i],
            real_cond=None if real_conds is None else real_conds[i],
            fake_cond=None if fake_conds is None else fake_conds[i],
            zero_center=True, combine="sum")
    return total
