"""Conditional GAN facade — functional loss assembly (reference txt2vid/gan/cond_gan.py).

The reference's `CondGan` is an object that mutates module grads; here it is a pure
loss-assembly layer: module definitions + metadata are held, every method takes
variables explicitly and returns values. The train step (gan/train_step.py) closes
over these methods inside jax.grad.

Loss semantics preserved (cond_gan.py:34-118):
  * pairwise conditional D loss: real_cc = D(x_r, c_r), real_ic = D(x_r, c_f) (reusing
    cached features), fake_cc = D(x_f, c_r); D loss = (mean uncond pairing + mean of
    the two conditional pairings) / 2;
  * unconditional path compares D(x_r) vs D(x_f) per scale;
  * G loss re-forwards D on fake vs cached real preds, (uncond + cond)/2;
  * per-discriminator losses combined by mean or `discrim_lambdas` weights;
  * mismatched captions via a batch derangement of the scale-0 cond, truncated per
    scale (cond_gan.py:132-134).

Discriminator output protocol: every discriminator's output is normalized to a list of
per-scale triples (uncond_logit | None, cond_logit | None, features | None).
Single-output conditional discriminators (TCWYT video/frame/motion) contribute their
logit as the *conditional* logit with no unconditional term — the reference's engine
would crash on these (iterating a 0-d tensor, video_discrim.py:57); this is the
working generalization of the TCWYT paper's matched/mismatched pairing.
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from txt2vid_tpu.gan.losses import gradient_penalty, multiscale_gradient_penalty


def _as_list(x):
    return x if isinstance(x, (list, tuple)) else [x]


def _normalize_preds(out, cond_given: bool):
    """Coerce a discriminator output to [(uncond, cond, features), ...] per scale."""
    if isinstance(out, list):
        return [t if isinstance(t, tuple) else
                ((None, t, None) if cond_given else (t, None, None)) for t in out]
    if isinstance(out, tuple) and len(out) == 3:
        return [out]
    return [(None, out, None) if cond_given else (out, None, None)]


class CondGan:
    def __init__(self, gen=None, discrims=None, cond_encoder=None, discrim_names=None,
                 sample_mapping=None, discrim_lambdas=None):
        assert gen is not None and discrims is not None and len(discrims) >= 1
        if discrim_names is None:
            discrim_names = [f"discrim-{i}" for i in range(len(discrims))]
        self.gen = gen
        self.discrims = list(discrims)
        self.cond_encoder = cond_encoder
        self.discrim_names = list(discrim_names)
        self.sample_mapping = sample_mapping
        self.discrim_lambdas = discrim_lambdas

    # ------------------------------------------------------------------ applies

    def generate(self, g_vars, z, cond=None, key=None, train: bool = True,
                 with_stats: bool = False):
        """Run the generator; returns a LIST of scales (single-scale gens wrapped).
        with_stats also returns updated batch_stats."""
        rngs = {"sample": key} if key is not None else {}
        kwargs = dict(train=train)
        if cond is not None:
            kwargs["cond"] = cond
        out, updates = self.gen.apply(g_vars, z, rngs=rngs, mutable=["batch_stats"],
                                      **kwargs)
        scales = _as_list(out)
        return (scales, updates) if with_stats else scales

    def encode(self, txt_vars, captions, lengths):
        """Caption encoding -> (B, cond_dim) sentence vectors (hn)."""
        _, _, hn = self.cond_encoder.apply(txt_vars, captions, lengths=lengths,
                                           method=self.cond_encoder.encode)
        return hn

    def map_features(self, m_vars, video, train: bool = True):
        """Apply the (frozen) sample mapping M, e.g. FrameMap (reference
        cond_gan.py:23-24; M's params are in neither reference optimizer, so it stays
        a fixed feature extractor)."""
        if self.sample_mapping is None or video is None:
            return None
        out, _ = self.sample_mapping.apply(m_vars, video, train=train,
                                           mutable=["batch_stats"])
        return out

    def apply_discrim(self, i, d_vars, x_scales, cond_scales=None, xbar=None,
                      computed_features=None, train: bool = True):
        """Apply discriminator i; returns normalized per-scale triples."""
        d = self.discrims[i]
        cond_given = cond_scales is not None
        if getattr(d, "is_multiscale", False):
            out, _ = d.apply(d_vars, x_scales, cond=cond_scales,
                             computed_features=computed_features, train=train,
                             mutable=["batch_stats"])
        else:
            kwargs = dict(x=x_scales[0] if x_scales is not None else None,
                          cond=cond_scales[0] if cond_given else None,
                          train=train)
            if xbar is not None:
                kwargs["xbar"] = xbar
            out, _ = d.apply(d_vars, mutable=["batch_stats"], **kwargs)
        return _normalize_preds(out, cond_given)

    # ------------------------------------------------------------- loss assembly

    def make_fake_conds(self, cond_scales, key):
        """Mismatched captions: a uniformly random n-cycle derangement of the scale-0
        cond (gen_perm_device — every caption displaced, like the reference's gen_perm,
        util/misc.py:3-8 / cond_gan.py:132-134), truncated to each scale's batch.
        At batch 1 no derangement exists (the reference's gen_perm would loop forever);
        the single "mismatched" caption degenerates to the matched one."""
        from txt2vid_tpu.utils.misc import gen_perm_device
        b0 = cond_scales[0].shape[0]
        fake0 = cond_scales[0][gen_perm_device(key, b0)]
        return [fake0[: c.shape[0]] for c in cond_scales]

    def discrim_forward(self, i, d_vars, real_scales=None, fake_scales=None,
                        cond_scales=None, fake_cond_scales=None, real_mapping=None,
                        fake_mapping=None, loss=None, gp_lambda: float = -1.0,
                        gp_key=None, train: bool = True, gp_only: bool = False):
        """Per-discriminator D-phase loss (reference cond_gan.py:34-87).
        Returns (loss | None, fake_pred, real_pred).

        gp_only=True returns ONLY the gp_lambda-weighted gradient-penalty term
        (no main-loss forwards). The GP's D forward runs on alpha-interpolated
        inputs, so it shares no intermediates with the main loss — splitting
        them is a clean decomposition: both-terms loss == main + gp_only, and
        the same holds for parameter gradients (pinned by
        tests/test_train_step.py). Used by TrainConfig.gp_quarantine to give
        the GP term its own vjp whose non-finite leaves can be zeroed without
        touching the main-loss gradient."""
        l = None
        fake_pred = None
        real_pred = None

        if gp_only:
            if loss is not None and gp_lambda > 0:
                gp = self._gradient_penalty(i, d_vars, gp_key, real_scales,
                                            fake_scales, cond_scales,
                                            fake_cond_scales, real_mapping,
                                            fake_mapping, train)
                l = gp_lambda * gp
            return l, fake_pred, real_pred

        if cond_scales is not None:
            real_cc = self.apply_discrim(i, d_vars, real_scales, cond_scales,
                                         xbar=real_mapping, train=train)
            real_pred = real_cc
            if loss is not None:
                assert fake_cond_scales is not None
                feats = [t[2] for t in real_cc]
                cf = feats if all(f is not None for f in feats) else None
                real_ic = self.apply_discrim(i, d_vars, real_scales, fake_cond_scales,
                                             xbar=real_mapping, computed_features=cf,
                                             train=train)
                fake_cc = self.apply_discrim(i, d_vars, fake_scales, cond_scales,
                                             xbar=fake_mapping, train=train)
                fake_pred = fake_cc

                have_uncond = all(f[0] is not None and r[0] is not None
                                  for f, r in zip(fake_cc, real_cc))
                loss_c1 = jnp.stack([loss.discrim_loss(fake=f[1], real=r[1])
                                     for f, r in zip(fake_cc, real_cc)])
                loss_c2 = jnp.stack([loss.discrim_loss(fake=f[1], real=r[1])
                                     for f, r in zip(real_ic, real_cc)])
                loss_cond = (loss_c1.mean() + loss_c2.mean()) / 2.0
                if have_uncond:
                    loss_uncond = jnp.stack([loss.discrim_loss(fake=f[0], real=r[0])
                                             for f, r in zip(fake_cc, real_cc)]).mean()
                    l = (loss_uncond + loss_cond) / 2.0
                else:
                    l = loss_cond
        else:
            if real_scales is not None:
                real_pred = self.apply_discrim(i, d_vars, real_scales,
                                               xbar=real_mapping, train=train)
            if fake_scales is not None:
                fake_pred = self.apply_discrim(i, d_vars, fake_scales,
                                               xbar=fake_mapping, train=train)
            if loss is not None and fake_pred is not None and real_pred is not None:
                l = jnp.stack([loss.discrim_loss(fake=f[0], real=r[0])
                               for f, r in zip(fake_pred, real_pred)]).mean()

        if l is not None and gp_lambda > 0:
            gp = self._gradient_penalty(i, d_vars, gp_key, real_scales, fake_scales,
                                        cond_scales, fake_cond_scales, real_mapping,
                                        fake_mapping, train)
            l = l + gp_lambda * gp

        return l, fake_pred, real_pred

    def _gradient_penalty(self, i, d_vars, key, real_scales, fake_scales, cond_scales,
                          fake_cond_scales, real_mapping, fake_mapping, train):
        from txt2vid_tpu.ops.attention import no_pallas
        with no_pallas():
            return self._gradient_penalty_impl(
                i, d_vars, key, real_scales, fake_scales, cond_scales,
                fake_cond_scales, real_mapping, fake_mapping, train)

    def _gradient_penalty_impl(self, i, d_vars, key, real_scales, fake_scales,
                               cond_scales, fake_cond_scales, real_mapping,
                               fake_mapping, train):
        d = self.discrims[i]
        if getattr(d, "is_multiscale", False):
            def d_fn_for_scale(si):
                def fn(x, cond, xbar):
                    out, _ = d.apply(d_vars, [x],
                                     cond=None if cond is None else [cond],
                                     train=train, scale_indices=[si],
                                     mutable=["batch_stats"])
                    u, c, _ = out[0]
                    return u, c
                return fn
            return multiscale_gradient_penalty(
                d_fn_for_scale, key, real_scales, fake_scales,
                real_conds=cond_scales, fake_conds=fake_cond_scales)

        def d_fn(x, cond, xbar):
            preds = self.apply_discrim(i, d_vars, [x],
                                       None if cond is None else [cond],
                                       xbar=xbar, train=train)
            u, c, _ = preds[0]
            return u, c
        return gradient_penalty(
            d_fn, key,
            real_x=real_scales[0], fake_x=fake_scales[0],
            real_xbar=real_mapping, fake_xbar=fake_mapping,
            real_cond=None if cond_scales is None else cond_scales[0],
            fake_cond=None if fake_cond_scales is None else fake_cond_scales[0])

    def all_discrim_forward(self, d_vars_list, real_scales=None, fake_scales=None,
                            cond_scales=None, loss=None, gp_lambda: float = -1.0,
                            key=None, m_vars=None, train: bool = True,
                            gp_only: bool = False):
        """Loop over discriminators (reference cond_gan.py:121-154).
        Returns (losses, fake_preds, real_preds). gp_only: see discrim_forward —
        the per-discriminator key splits below are unconditional on gp_only, so
        the gp_only pass draws the SAME perm/gp keys as the main pass and the
        two decompose the both-terms loss exactly."""
        real_mapping = fake_mapping = None
        if self.sample_mapping is not None:
            real_video = real_scales[0] if real_scales is not None else None
            fake_video = fake_scales[0] if fake_scales is not None else None
            real_mapping = self.map_features(m_vars, real_video, train=train)
            fake_mapping = self.map_features(m_vars, fake_video, train=train)

        losses, fake_preds, real_preds = [], [], []
        for i in range(len(self.discrims)):
            fake_conds = None
            if cond_scales is not None and loss is not None:
                key, perm_key = jax.random.split(key)
                fake_conds = self.make_fake_conds(cond_scales, perm_key)
            gp_key = None
            if key is not None:
                key, gp_key = jax.random.split(key)
            l, f, r = self.discrim_forward(
                i, d_vars_list[i], real_scales=real_scales, fake_scales=fake_scales,
                cond_scales=cond_scales, fake_cond_scales=fake_conds,
                real_mapping=real_mapping, fake_mapping=fake_mapping,
                loss=loss, gp_lambda=gp_lambda, gp_key=gp_key, train=train,
                gp_only=gp_only)
            losses.append(l)
            fake_preds.append(f)
            real_preds.append(r)
        return losses, fake_preds, real_preds

    def weighted_sum(self, losses):
        """Mean or lambda-weighted sum over per-discriminator losses (reference
        cond_gan.py:26-31)."""
        stacked = jnp.stack(losses)
        if self.discrim_lambdas is None:
            return jnp.mean(stacked)
        lambdas = jnp.asarray(self.discrim_lambdas, dtype=stacked.dtype)
        return jnp.sum(lambdas * stacked)

    def gen_loss(self, d_vars_list, fake_scales, real_preds, cond_scales=None,
                 loss=None, m_vars=None, train: bool = True):
        """G-phase loss vs cached real preds (reference cond_gan.py:90-118)."""
        fake_mapping = None
        if self.sample_mapping is not None:
            fake_mapping = self.map_features(m_vars, fake_scales[0], train=train)

        losses = []
        for i in range(len(self.discrims)):
            fake_cc = self.apply_discrim(i, d_vars_list[i], fake_scales, cond_scales,
                                         xbar=fake_mapping, train=train)
            r = real_preds[i]
            if cond_scales is None:
                per_scale = [loss.gen_loss(fake=f[0], real=rr[0])
                             for f, rr in zip(fake_cc, r)]
                losses.append(jnp.stack(per_scale).mean())
            else:
                have_uncond = all(f[0] is not None and rr[0] is not None
                                  for f, rr in zip(fake_cc, r))
                loss_cond = jnp.stack([loss.gen_loss(fake=f[1], real=rr[1])
                                       for f, rr in zip(fake_cc, r)]).mean()
                if have_uncond:
                    loss_uncond = jnp.stack([loss.gen_loss(fake=f[0], real=rr[0])
                                             for f, rr in zip(fake_cc, r)]).mean()
                    losses.append((loss_cond + loss_uncond) / 2.0)
                else:
                    losses.append(loss_cond)
        return self.weighted_sum(losses)
