"""Jitted GAN train step (reference txt2vid/gan/trainer.py:190-333 hot loop, made
functional).

One compiled program performs: caption encoding, the multiscale real pyramid, fake
generation, `discrim_steps` discriminator updates (fakes stop-gradiented — the
functional equivalent of the reference's detach_all, trainer.py:128-129,232), the
real-pred re-forward, and `gen_steps` generator updates re-generating fakes from the
SAME z (trainer.py:251-256). Both optimizers live inside the step; when `end2end`,
encoder params sit in BOTH optimizer param trees (reference train/gan.py:82-85) and
their gradients flow through the conditional inputs in each phase.

BatchNorm running stats: torch updates them on every train-mode forward; they do not
affect training math (train mode normalizes by batch stats), and the reference only
ever consumes them via gen.eval() at sampling time (trainer.py:47). We therefore
update the GENERATOR's running stats once per step (from the G-phase forward) and
leave discriminator stats untouched — loss/gradient-identical, far less plumbing.
"""

from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct

from txt2vid_tpu.gan.cond_gan import CondGan
from txt2vid_tpu.ops.subsample import multiscale_pyramid


@dataclass(frozen=True)
class TrainConfig:
    """Static configuration for the compiled step (reference trainer.py flag surface,
    add_params_to_parser trainer.py:15-42)."""

    frame_sizes: Sequence[int] = (64,)
    subsample_input: bool = False
    discrim_steps: int = 1
    gen_steps: int = 1
    gp_lambda: float = -1.0
    # Lazy gradient-penalty regularization (StyleGAN2 §5.1 "lazy regularization"):
    # apply the GP term only every `gp_every`-th step, with its weight scaled by
    # gp_every so the time-averaged regularization strength is unchanged. The GP
    # is the most expensive part of a GP-bearing step (a second conditional D
    # forward plus a double backward: +36-43% step time, RESULTS.md round 3), and
    # its gradients change slowly relative to the optimizer steps, so amortizing
    # it is a near-free speedup. 1 = the reference's every-step behavior. Off
    # steps skip the GP computation entirely at runtime (lax.cond on the device
    # step counter — both branches compile, one executes).
    gp_every: int = 1
    # GP-gradient quarantine (--gp_quarantine): compute the gradient-penalty
    # term's parameter gradient as a SEPARATE vjp from the main D loss and
    # zero only ITS non-finite leaves, so one poisoned GP double-backward
    # costs that step's regularization, not the run. Motivation (RESULTS.md
    # round 3, queue-19 + the r4 GP probes): at the 3-scale cond-128 flagship
    # shape the GP double-backward (∇_θ‖∇_x D‖²) enters a params region where
    # it is non-finite on EVERY batch while the main-loss gradient, the loss
    # value, and |g|G all stay finite — without the quarantine the whole D
    # phase freezes (the clip guard zeroes the combined update forever). The
    # split is exact: the GP forward runs on alpha-interpolated inputs and
    # shares no residuals with the main loss, so main + gp_only gradients
    # equal the fused gradient (pinned by tests). A `gp_quarantined` metric
    # counts zeroed leaves so quarantined steps are visible, not silent.
    gp_quarantine: bool = False
    end2end: bool = False
    # Reference --end2end puts encoder params in BOTH optimizers (gan.py:82-85).
    # False = encoder updated by the D phase only: the G phase cannot minimize its
    # loss by collapsing the encoder to a constant (the degenerate shortcut the
    # both-optimizers form admits — G loss is minimized when matched and mismatched
    # captions become indistinguishable), while D still shapes the encoding to
    # separate matched from mismatched pairs.
    end2end_txt_in_g: bool = True
    mean_discrim_loss: bool = False     # reference --no_mean_discrim_loss default
    mean_gen_loss: bool = False
    img_model: bool = False
    latent_size: int = 256
    # Global gradient-norm clip applied INSIDE the step, reusing the grad_norm
    # metric's reduction (0 = off). Deliberately NOT an optax.chain wrapper:
    # in-step clipping leaves the optimizer state structure unchanged (so
    # clipped and unclipped runs share checkpoints) and costs one global-norm
    # reduction per phase instead of two. A non-finite norm (Inf/NaN blow-up)
    # zeroes the phase's update entirely — the step degrades to a no-op
    # instead of poisoning the parameters (the failure mode of the 3-scale
    # cond-128 arm, RESULTS.md round 3).
    clip_grad: float = 0.0
    # Compute the generator forward ONCE per step via jax.vjp and reuse it for both
    # phases. The step already draws the SAME z for the D-phase fakes and the
    # G-phase re-generation (reference trainer.py:251-256), so outside end2end the
    # two generator forwards are numerically identical — the reference (and the
    # default path below) simply pays for the second one. With the step HBM-bound
    # (RESULTS.md roofline), deleting a full no-grad G forward is a pure byte/FLOP
    # saving; gradients are mathematically unchanged (pinned by
    # tests/test_infra.py shared-fwd equivalence). Applies when gen_steps == 1 and
    # not (end2end with captions); otherwise the step silently uses the default
    # two-forward path.
    shared_gen_fwd: bool = False
    # f32-master / bf16-compute parameters (--bf16_params, VERDICT r3 byte-lever
    # item): materialize ONE half-width copy of each float32 G/D param tree per
    # step and run every forward/backward from it; the stored params and the
    # optimizer update stay f32. flax's dtype=bf16 modules cast params at each
    # USE, so every program that touches a weight re-reads its f32 buffer —
    # with the D forwarded 4-6x per step (pairings, GP, G phase) that is
    # N_uses x 4 bytes/param of HBM traffic on a bandwidth-bound step
    # (RESULTS.md roofline). The explicit once-per-step copy (under an
    # optimization_barrier so XLA cannot fold it back into per-use casts)
    # makes the re-reads half-width. Gradients keep f32 dtype (the astype vjp
    # converts cotangents back); the encoder is deliberately NOT cast (it is
    # built without a bf16 policy — casting would change its numerics, not
    # just its bandwidth).
    compute_dtype: Any = None


class GanTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    g_vars: Any
    d_vars: Any                          # tuple of per-discriminator variable dicts
    txt_vars: Any                        # dict or None
    m_vars: Any                          # dict or None
    opt_g_state: Any
    opt_d_state: Any


def _merge_vars(variables, params):
    out = dict(variables)
    out["params"] = params
    return out


def _clip_by_norm(grads, norm, clip):
    """Scale grads so the global norm is <= clip, reusing the metric's
    already-computed norm. A non-finite norm zeroes the update: one poisoned
    backward then costs a step, not the run (see TrainConfig.clip_grad)."""
    finite = jnp.isfinite(norm)
    scale = jnp.where(finite,
                      jnp.minimum(1.0, clip / jnp.maximum(norm, 1e-20)), 0.0)
    # zero via select, not multiplication: inf * 0.0 = nan
    return jax.tree.map(
        lambda g: jnp.where(finite, g * scale, jnp.zeros_like(g)), grads)


def _quarantine_nonfinite(grads):
    """Zero every non-finite LEAF of a gradient tree (via select — a
    multiplicative zero re-poisons: inf * 0 = nan) and count how many leaves
    were zeroed. Per-leaf, not global: a blow-up usually poisons a subtree
    (e.g. one discriminator scale's params through the GP double-backward)
    while the rest of the tree is usable. The optimization barrier keeps the
    sanitize selects from fusing into the producing backward — selects fused
    into the D backward are exactly the bisect-18 miscompile trigger at the
    flagship shape (see _norm_and_clip)."""
    grads = jax.lax.optimization_barrier(grads)
    leaves, treedef = jax.tree_util.tree_flatten(grads)
    n_bad = jnp.zeros((), jnp.int32)
    out = []
    for leaf in leaves:
        ok = jnp.all(jnp.isfinite(leaf))
        n_bad = n_bad + jnp.where(ok, 0, 1).astype(jnp.int32)
        out.append(jnp.where(ok, leaf, jnp.zeros_like(leaf)))
    return jax.tree_util.tree_unflatten(treedef, out), n_bad


def _norm_and_clip(grads, clip):
    """Global grad norm (the |g| metric) plus optional in-step clipping.

    The optimization barrier is load-bearing, not hygiene: on the TPU backend
    the 3-scale cond-128 flagship's D backward compiles to NaN gradients when
    the clip's scale-and-select ops are fused into the same program, while the
    clip-free program computes finite gradients from identical inputs
    (measured iter-for-iter: scripts/probe_gnorm_tpu.py, RESULTS.md round 3 —
    the queue-14 "chain-clip NaN at iter 1" and the queue-16 silently-frozen
    discriminator were both this). Forcing the gradients to materialize before
    the clip math keeps the backward byte-identical to the unclipped program,
    which is exactly the numerics the clip is supposed to preserve.

    LIMIT OF THE FIX (queue-17 gate + bisect-18, RESULTS.md round 3): the
    barrier recovers finite gradients in the standalone flagship probe, but
    the full trainer-compiled program (device-resident data + deferred
    metrics) STILL compiles the D backward to NaN at that one shape with any
    clip formulation, while its clip-free compile is finite iter-for-iter.
    Flagship production therefore runs clip-free and relies on the host-side
    spike protection instead (trainer.NanAbort: poisoned states are never
    checkpointed, the harness rolls back and reseeds — scripts/r3_queue18.sh).
    --clip_grad remains correct and tested on every other shape and backend.

    TXT2VID_CLIP_NO_BARRIER=1 removes the barrier — FOR THE STANDALONE
    MISCOMPILE REPRODUCER ONLY (scripts/repro_clip_miscompile.py needs the
    known-bad fused program as its positive control). Never set in training."""
    import os
    if clip:
        if os.environ.get("TXT2VID_CLIP_NO_BARRIER", "0") != "1":
            grads = jax.lax.optimization_barrier(grads)
    norm = optax.global_norm(grads)
    if clip:
        grads = _clip_by_norm(grads, norm, clip)
    return grads, norm


def init_state(gan: CondGan, key, sample_batch, optG, optD, config: TrainConfig):
    """Initialize all variables and optimizer states from a representative batch.
    The whole initialization runs under ONE jit — unjitted flax init dispatches each
    primitive eagerly, which is pathologically slow over remote-device transports."""
    return jax.jit(lambda k, b: _init_state_impl(gan, k, b, optG, optD, config))(
        key, sample_batch)


def init_state_abstract(gan: CondGan, key, sample_batch, optG, optD,
                        config: TrainConfig):
    """Zero-valued state with the exact structure/shapes of init_state, built via
    eval_shape — NO device computation or compile. For benchmarks and state templates
    (checkpoint restore targets), where parameter values are irrelevant."""
    import numpy as np

    shapes = jax.eval_shape(
        lambda k, b: _init_state_impl(gan, k, b, optG, optD, config),
        key, sample_batch)
    return jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), shapes)


def _init_state_impl(gan: CondGan, key, sample_batch, optG, optD, config: TrainConfig):
    kg, kd, kt, km, ks, kp = jax.random.split(key, 6)

    captions = sample_batch.get("captions")
    lengths = sample_batch.get("lengths")

    txt_vars = None
    cond = None
    if gan.cond_encoder is not None and captions is not None:
        txt_vars = gan.cond_encoder.init(kt, captions, lengths=lengths)
        cond = gan.encode(txt_vars, captions, lengths)

    x = sample_batch["video"]
    b = x.shape[0]
    z = jax.random.normal(kg, (b, config.latent_size))

    g_kwargs = dict(train=True)
    if cond is not None:
        g_kwargs["cond"] = cond
    g_vars = gan.gen.init({"params": kg, "sample": ks}, z, **g_kwargs)

    if config.img_model:
        real_scales, cond_scales = [x], (None if cond is None else [cond])
    else:
        real_scales, cond_scales = multiscale_pyramid(
            x, cond, list(config.frame_sizes), kp, config.subsample_input)

    m_vars = None
    xbar = None
    if gan.sample_mapping is not None:
        m_vars = gan.sample_mapping.init(km, real_scales[0], train=True)
        xbar = gan.map_features(m_vars, real_scales[0], train=True)

    d_vars = []
    for i, d in enumerate(gan.discrims):
        dk = jax.random.fold_in(kd, i)
        if getattr(d, "is_multiscale", False):
            v = d.init(dk, real_scales, cond=cond_scales, train=True)
        else:
            kwargs = dict(x=real_scales[0], train=True)
            if cond_scales is not None:
                kwargs["cond"] = cond_scales[0]
            if xbar is not None:
                kwargs["xbar"] = xbar
            v = d.init(dk, **kwargs)
        d_vars.append(v)
    d_vars = tuple(d_vars)

    g_opt_params = {"g": g_vars["params"]}
    d_opt_params = {"d": tuple(v["params"] for v in d_vars)}
    if config.end2end and txt_vars is not None:
        if config.end2end_txt_in_g:
            g_opt_params["txt"] = txt_vars["params"]
        d_opt_params["txt"] = txt_vars["params"]

    return GanTrainState(
        step=jnp.zeros((), jnp.int32),
        g_vars=g_vars, d_vars=d_vars, txt_vars=txt_vars, m_vars=m_vars,
        opt_g_state=optG.init(g_opt_params),
        opt_d_state=optD.init(d_opt_params),
    )


def build_train_step(gan: CondGan, losses, optG, optD, config: TrainConfig):
    """Returns train_step(state, batch, key) -> (state, metrics), jit-ready."""

    def scales_for(x, cond, key):
        if config.img_model or len(config.frame_sizes) == 1:
            return [x], (None if cond is None else [cond])
        return multiscale_pyramid(x, cond, list(config.frame_sizes), key,
                                  config.subsample_input)

    cdtype = config.compute_dtype
    from txt2vid_tpu.parallel.mesh import maybe_gather_params as _gather

    def cast_tree(params):
        """The step's param-use view: (1) under an fsdp mesh's
        gather_params_at_use trace context (parallel/mesh.py), constrain the
        tree REPLICATED so every consumer — including the conv backward's
        rev(W) — sees one sharding (kills GSPMD's involuntary-remat
        resharding); (2) with TrainConfig.compute_dtype, one materialized
        half-width copy for all forwards/backwards. Identity when both levers
        are off."""
        params = _gather(params)
        if cdtype is None:
            return params
        cast = jax.tree.map(
            lambda x: x.astype(cdtype) if x.dtype == jnp.float32 else x,
            params)
        return jax.lax.optimization_barrier(cast)

    def train_step(state, batch, key):
        # Per-step key derived ON DEVICE from the step counter: the host loop passes
        # the SAME base key every iteration, so it never dispatches a per-iteration
        # random-split program (each tiny dispatch is a full RPC on remote
        # transports — a large share of the round-1 CLI-vs-bench step-time gap).
        key = jax.random.fold_in(key, state.step)
        x = batch["video"]
        if x.dtype == jnp.uint8:
            # uint8 host transport; reference-normalization on device
            x = x.astype(jnp.float32) / 127.5 - 1.0
        b = x.shape[0]
        k_z, k_pyr, k_gen, k_d, k_g = jax.random.split(key, 5)

        has_cond = gan.cond_encoder is not None and batch.get("captions") is not None

        z = jax.random.normal(k_z, (b, config.latent_size))

        # --- frozen-cond path (used whenever grads need not flow to the encoder)
        cond_const = None
        if has_cond:
            cond_const = jax.lax.stop_gradient(
                gan.encode(state.txt_vars, batch["captions"], batch["lengths"]))

        real_scales_const, cond_scales_const = scales_for(x, cond_const, k_pyr)

        # --- fake generation for the D phase (detached, reference trainer.py:232)
        # shared_gen_fwd: one jax.vjp'd generator forward serves both phases (the
        # D-phase fakes below and the G-phase gradient at the bottom); both paths
        # feed the SAME (params, z, cond, key), so the programs are numerically
        # identical — the shared path just stops paying for the duplicate forward.
        shared = (config.shared_gen_fwd and config.gen_steps == 1
                  and not (config.end2end and has_cond))
        vjp_fake = fake_scales_live = shared_stats = None
        if shared:
            def gen_fwd(g_params):
                return gan.generate(_merge_vars(state.g_vars,
                                                cast_tree(g_params)), z,
                                    cond=cond_const, key=k_gen, train=True,
                                    with_stats=True)
            fake_scales_live, vjp_fake, shared_stats = jax.vjp(
                gen_fwd, state.g_vars["params"], has_aux=True)
            fake_scales = jax.lax.stop_gradient(fake_scales_live)
        else:
            fake_scales = gan.generate(
                _merge_vars(state.g_vars, cast_tree(state.g_vars["params"])),
                z, cond=cond_const, key=k_gen, train=True)
            fake_scales = jax.lax.stop_gradient(fake_scales)

        # trace-time config check: the generator's rendered pyramid must match
        # the data pyramid (frame_sizes) positionally — a mismatched generator
        # (wrong additional_blocks/fm_stride for frame_sizes) otherwise
        # surfaces as an inscrutable broadcast error inside the GP interpolant
        if [f.shape[2:4] for f in fake_scales] != \
                [r.shape[2:4] for r in real_scales_const]:
            raise ValueError(
                "generator pyramid "
                f"{[tuple(f.shape[2:4]) for f in fake_scales]} does not match "
                f"--frame_sizes pyramid "
                f"{[tuple(r.shape[2:4]) for r in real_scales_const]}; check the "
                "generator's width/additional_blocks/fm_stride against "
                "frame_sizes")

        # ------------------------------------------------------------- D phase
        d_opt_params = {"d": tuple(v["params"] for v in state.d_vars)}
        if config.end2end and state.txt_vars is not None:
            d_opt_params["txt"] = state.txt_vars["params"]

        def make_d_loss(gp_lambda, gp_only=False):
            def d_loss_fn(opt_params, dkey):
                d_vars_list = [
                    _merge_vars(v, cast_tree(p))
                    for v, p in zip(state.d_vars, opt_params["d"])]
                if config.end2end and has_cond:
                    cond = gan.encode(_merge_vars(state.txt_vars, _gather(opt_params["txt"])),
                                      batch["captions"], batch["lengths"])
                    real_scales, cond_scales = scales_for(x, cond, k_pyr)
                else:
                    real_scales, cond_scales = real_scales_const, cond_scales_const
                ls, _, _ = gan.all_discrim_forward(
                    d_vars_list, real_scales=real_scales, fake_scales=fake_scales,
                    cond_scales=cond_scales, loss=losses,
                    gp_lambda=gp_lambda, key=dkey, m_vars=state.m_vars, train=True,
                    gp_only=gp_only)
                total = gan.weighted_sum(ls)
                if config.mean_discrim_loss:
                    total = total / config.discrim_steps
                return total
            return d_loss_fn

        # d-phase runners, all (opt_params, dkey) -> (loss, grads, n_quarantined)
        def d_run_plain(gp_lambda):
            vg = jax.value_and_grad(make_d_loss(gp_lambda))

            def run(opt_params, dkey):
                loss, grads = vg(opt_params, dkey)
                return loss, grads, jnp.zeros((), jnp.int32)
            return run

        def d_run_quarantined(gp_lambda):
            # two vjps: the GP forward runs on interpolates, so it shares no
            # residuals with the main loss — splitting costs ~nothing and lets
            # a poisoned GP gradient be zeroed per-leaf without touching the
            # main-loss gradient (see TrainConfig.gp_quarantine)
            main_vg = jax.value_and_grad(make_d_loss(-1.0))
            gp_vg = jax.value_and_grad(make_d_loss(gp_lambda, gp_only=True))

            def run(opt_params, dkey):
                loss_main, g_main = main_vg(opt_params, dkey)
                loss_gp, g_gp = gp_vg(opt_params, dkey)
                g_gp, n_bad = _quarantine_nonfinite(g_gp)
                ok_v = jnp.isfinite(loss_gp)
                n_bad = n_bad + jnp.where(ok_v, 0, 1).astype(jnp.int32)
                loss_gp = jnp.where(ok_v, loss_gp, 0.0)
                grads = jax.tree.map(jnp.add, g_main, g_gp)
                return loss_main + loss_gp, grads, n_bad
            return run

        lazy_gp = config.gp_lambda > 0 and config.gp_every > 1
        quarantine = config.gp_quarantine and config.gp_lambda > 0
        # lazy regularization: GP on step % gp_every == 0, weight scaled by
        # gp_every (time-averaged strength preserved); off steps run the
        # no-GP branch — no second D forward, no double backward
        gp_scale = config.gp_lambda * (config.gp_every if lazy_gp else 1)
        d_run_on = (d_run_quarantined if quarantine else d_run_plain)(gp_scale)
        if lazy_gp:
            do_gp = (state.step % config.gp_every) == 0
            d_run_off = d_run_plain(-1.0)

        opt_d_state = state.opt_d_state
        total_d_loss = 0.0
        gp_quar = jnp.zeros((), jnp.int32)
        d_grad_norm = g_grad_norm = jnp.zeros((), jnp.float32)
        for j in range(config.discrim_steps):
            dkey = jax.random.fold_in(k_d, j)
            if lazy_gp:
                loss_d, grads, n_bad = jax.lax.cond(
                    do_gp,
                    lambda a: d_run_on(*a),
                    lambda a: d_run_off(*a),
                    (d_opt_params, dkey))
            else:
                loss_d, grads, n_bad = d_run_on(d_opt_params, dkey)
            gp_quar = gp_quar + n_bad
            grads, d_grad_norm = _norm_and_clip(grads, config.clip_grad)
            updates, opt_d_state = optD.update(grads, opt_d_state, d_opt_params)
            d_opt_params = optax.apply_updates(d_opt_params, updates)
            total_d_loss = total_d_loss + loss_d

        new_d_vars = tuple(
            _merge_vars(v, p) for v, p in zip(state.d_vars, d_opt_params["d"]))
        # G-phase D consumers (incl. the backward through the updated D) read
        # the param-use view: compute-dtype copy and/or fsdp gather constraint
        from txt2vid_tpu.parallel.mesh import _GATHER_PARAMS
        new_d_vars_use = new_d_vars if (cdtype is None and not _GATHER_PARAMS) \
            else tuple(_merge_vars(v, cast_tree(v["params"]))
                       for v in new_d_vars)
        txt_params = d_opt_params.get(
            "txt", None if state.txt_vars is None else state.txt_vars["params"])

        # ------------------------------------------------------------- G phase
        txt_grads_in_g = (config.end2end and config.end2end_txt_in_g and has_cond)
        g_opt_params = {"g": state.g_vars["params"]}
        if txt_grads_in_g and state.txt_vars is not None:
            g_opt_params["txt"] = txt_params

        # cached real predictions with updated D (reference trainer.py:247); when
        # encoder grads flow in the G phase they are recomputed inside the G loss
        real_preds_const = None
        cond_scales_g = cond_scales_const
        if not txt_grads_in_g:
            if config.end2end and has_cond:
                # encoder was updated by the D phase: re-encode (no grads) so the
                # G phase conditions on the CURRENT encoder
                cond_g = jax.lax.stop_gradient(gan.encode(
                    _merge_vars(state.txt_vars, txt_params),
                    batch["captions"], batch["lengths"]))
                real_scales_g, cond_scales_g = scales_for(x, cond_g, k_pyr)
            else:
                real_scales_g = real_scales_const
            real_preds_const = jax.lax.stop_gradient(gan.all_discrim_forward(
                new_d_vars_use, real_scales=real_scales_g,
                cond_scales=cond_scales_g, loss=None, key=None,
                m_vars=state.m_vars, train=True)[2])

        def g_loss_fn(opt_params, gkey):
            g_vars = _merge_vars(state.g_vars, cast_tree(opt_params["g"]))
            if txt_grads_in_g:
                cond = gan.encode(_merge_vars(state.txt_vars, _gather(opt_params["txt"])),
                                  batch["captions"], batch["lengths"])
                real_scales, cond_scales = scales_for(x, cond, k_pyr)
                real_preds = gan.all_discrim_forward(
                    new_d_vars_use, real_scales=real_scales, cond_scales=cond_scales,
                    loss=None, key=None, m_vars=state.m_vars, train=True)[2]
                gen_cond = cond_scales[0] if cond_scales is not None else None
            else:
                real_preds = real_preds_const
                cond_scales = cond_scales_g
                gen_cond = cond_scales[0] if cond_scales is not None else None

            fakes, g_stats = gan.generate(g_vars, z, cond=gen_cond, key=gkey,
                                          train=True, with_stats=True)
            total = gan.gen_loss(new_d_vars_use, fakes, real_preds,
                                 cond_scales=cond_scales, loss=losses,
                                 m_vars=state.m_vars, train=True)
            if config.mean_gen_loss:
                total = total / config.gen_steps
            return total, g_stats

        opt_g_state = state.opt_g_state
        total_g_loss = 0.0
        g_stats = state.g_vars.get("batch_stats")
        if shared:
            # gradient w.r.t. the SAVED fakes, pulled back through the single
            # generator forward's vjp — no second G forward
            def g_loss_from_fakes(fakes):
                total = gan.gen_loss(new_d_vars_use, fakes, real_preds_const,
                                     cond_scales=cond_scales_g, loss=losses,
                                     m_vars=state.m_vars, train=True)
                if config.mean_gen_loss:
                    total = total / config.gen_steps
                return total

            loss_g, dfakes = jax.value_and_grad(g_loss_from_fakes)(
                fake_scales_live)
            (g_param_grads,) = vjp_fake(dfakes)
            grads = {"g": g_param_grads}
            grads, g_grad_norm = _norm_and_clip(grads, config.clip_grad)
            updates, opt_g_state = optG.update(grads, opt_g_state, g_opt_params)
            g_opt_params = optax.apply_updates(g_opt_params, updates)
            total_g_loss = loss_g
            if shared_stats:
                g_stats = shared_stats["batch_stats"]
        else:
            for j in range(config.gen_steps):
                gkey = k_gen if j == 0 else jax.random.fold_in(k_g, j)
                (loss_g, new_stats), grads = jax.value_and_grad(
                    g_loss_fn, has_aux=True)(g_opt_params, gkey)
                grads, g_grad_norm = _norm_and_clip(grads, config.clip_grad)
                updates, opt_g_state = optG.update(grads, opt_g_state,
                                                   g_opt_params)
                g_opt_params = optax.apply_updates(g_opt_params, updates)
                total_g_loss = total_g_loss + loss_g
                if new_stats:
                    g_stats = new_stats["batch_stats"]

        new_g_vars = _merge_vars(state.g_vars, g_opt_params["g"])
        if g_stats is not None:
            new_g_vars["batch_stats"] = g_stats

        new_txt_vars = state.txt_vars
        if config.end2end and state.txt_vars is not None:
            new_txt_vars = _merge_vars(state.txt_vars,
                                       g_opt_params.get("txt", txt_params))

        new_state = state.replace(
            step=state.step + 1,
            g_vars=new_g_vars, d_vars=new_d_vars, txt_vars=new_txt_vars,
            opt_g_state=opt_g_state, opt_d_state=opt_d_state)
        # pre-clip global gradient norms (last sub-step of each phase): one
        # scalar reduction per phase, free against the step's HBM traffic, and
        # the first thing to look at in a blow-up (e.g. the 3-scale cond-128
        # NaN at iter ~950, RESULTS.md round 3) — also how a --clip_grad
        # threshold is chosen.
        metrics = {"loss_d": total_d_loss, "loss_g": total_g_loss,
                   "grad_norm_d": d_grad_norm, "grad_norm_g": g_grad_norm}
        if quarantine:
            metrics["gp_quarantined"] = gp_quar
        return new_state, metrics

    return train_step


def build_split_train_step(gan: CondGan, losses, optG, optD,
                           config: TrainConfig):
    """Split-dispatch clipping: the D backward and the clip math compiled into
    SEPARATE XLA programs (`--clip_grad_split`).

    Why this exists (RESULTS.md round 3, queues 14-18): at the 3-scale
    cond-128 flagship shape (batch 32) the TPU backend compiles the D backward
    to NaN gradients whenever ANY clip formulation — optax chain, in-step
    select, barrier+select — sits in the same program, while the identical
    backward WITHOUT clip ops is finite iter-for-iter. Clipping is exactly the
    spike protection that shape needs (three seed-independent |g|D spike NaNs
    in one evening), so this builder moves the clip out of the program instead
    of out of the run:

      1. d_grad_step(state, batch, key) -> (d_grads, loss_d) — the fused
         step's preamble + D backward, with NO clip ops anywhere in the
         program (the trigger is their fusion into this backward).
      2. clip_step(d_grads) -> (clipped, norm) — optax.global_norm + the same
         scale/select as _clip_by_norm, in a tiny program of its own.
      3. apply_step(state, batch, key, d_grads, d_grad_norm, loss_d)
         -> (state, metrics) — D optimizer update from the provided grads,
         then the full G phase (whose own backward never miscompiled; its
         clip stays in-program).

    Nothing large crosses the boundary: programs 1 and 3 re-derive
    z/cond/pyramid/fakes from the same (key, state.step) fold-in, so the only
    carried tensors are the D grads themselves (params-sized, one HBM
    round-trip ≈ single-digit ms against the ~670 ms flagship step). Cost vs
    the fused step: one extra generator forward (program 3 cannot reuse
    program 1's — jax.vjp residuals are not arrays), i.e. the shared_gen_fwd
    saving is paid back; ~8% at the bench shape. Use this only where the
    fused clip program miscompiles.

    Numerics are pinned equal to the fused in-step clip by
    tests/test_split_clip.py. Constraints: discrim_steps == 1 (the D
    grad->update->grad interleave cannot straddle programs).
    """
    assert config.discrim_steps == 1, \
        "--clip_grad_split requires discrim_steps == 1"

    def scales_for(x, cond, key):
        if config.img_model or len(config.frame_sizes) == 1:
            return [x], (None if cond is None else [cond])
        return multiscale_pyramid(x, cond, list(config.frame_sizes), key,
                                  config.subsample_input)

    def prelude(state, batch, key):
        """The fused step's deterministic preamble (keys, z, frozen cond, real
        pyramid) — run identically in programs 1 and 3 instead of shipping its
        outputs across the dispatch boundary."""
        key = jax.random.fold_in(key, state.step)
        x = batch["video"]
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 127.5 - 1.0
        b = x.shape[0]
        k_z, k_pyr, k_gen, k_d, k_g = jax.random.split(key, 5)
        has_cond = (gan.cond_encoder is not None
                    and batch.get("captions") is not None)
        z = jax.random.normal(k_z, (b, config.latent_size))
        cond_const = None
        if has_cond:
            cond_const = jax.lax.stop_gradient(
                gan.encode(state.txt_vars, batch["captions"],
                           batch["lengths"]))
        real_scales, cond_scales = scales_for(x, cond_const, k_pyr)
        return dict(x=x, z=z, has_cond=has_cond, cond_const=cond_const,
                    real_scales=real_scales, cond_scales=cond_scales,
                    k_pyr=k_pyr, k_gen=k_gen, k_d=k_d, k_g=k_g)

    def d_opt_params_of(state):
        p = {"d": tuple(v["params"] for v in state.d_vars)}
        if config.end2end and state.txt_vars is not None:
            p["txt"] = state.txt_vars["params"]
        return p

    # ------------------------------------------------- program 1: D backward
    def d_grad_step(state, batch, key):
        p = prelude(state, batch, key)
        fake_scales = jax.lax.stop_gradient(
            gan.generate(state.g_vars, p["z"], cond=p["cond_const"],
                         key=p["k_gen"], train=True))
        d_opt_params = d_opt_params_of(state)

        def make_d_loss(gp_lambda, gp_only=False):
            def d_loss_fn(opt_params, dkey):
                d_vars_list = [_merge_vars(v, q)
                               for v, q in zip(state.d_vars, opt_params["d"])]
                if config.end2end and p["has_cond"]:
                    cond = gan.encode(
                        _merge_vars(state.txt_vars, opt_params["txt"]),
                        batch["captions"], batch["lengths"])
                    real_scales, cond_scales = scales_for(
                        p["x"], cond, p["k_pyr"])
                else:
                    real_scales, cond_scales = p["real_scales"], p["cond_scales"]
                ls, _, _ = gan.all_discrim_forward(
                    d_vars_list, real_scales=real_scales,
                    fake_scales=fake_scales, cond_scales=cond_scales,
                    loss=losses, gp_lambda=gp_lambda, key=dkey,
                    m_vars=state.m_vars, train=True, gp_only=gp_only)
                total = gan.weighted_sum(ls)
                if config.mean_discrim_loss:
                    total = total / config.discrim_steps
                return total
            return d_loss_fn

        dkey = jax.random.fold_in(p["k_d"], 0)
        lazy_gp = config.gp_lambda > 0 and config.gp_every > 1
        gp_scale = config.gp_lambda * (config.gp_every if lazy_gp else 1)
        if config.gp_quarantine and config.gp_lambda > 0:
            # quarantine mode: main and GP gradients leave this program as
            # SEPARATE trees — the sanitize selects live in clip_step's
            # program, because selects fused into this backward are the
            # bisect-18 miscompile trigger at the flagship shape. The carried
            # payload doubles (two params-sized trees), still single-digit ms
            # against the flagship step.
            main_vg = jax.value_and_grad(make_d_loss(-1.0))
            gp_vg = jax.value_and_grad(make_d_loss(gp_scale, gp_only=True))

            def both(a):
                loss_main, g_main = main_vg(*a)
                loss_gp, g_gp = gp_vg(*a)
                return {"main": g_main, "gp": g_gp}, (loss_main, loss_gp)

            if lazy_gp:
                def main_only(a):
                    loss_main, g_main = main_vg(*a)
                    return ({"main": g_main,
                             "gp": jax.tree.map(jnp.zeros_like, g_main)},
                            (loss_main, jnp.zeros_like(loss_main)))
                do_gp = (state.step % config.gp_every) == 0
                return jax.lax.cond(do_gp, both, main_only,
                                    (d_opt_params, dkey))
            return both((d_opt_params, dkey))
        if lazy_gp:
            do_gp = (state.step % config.gp_every) == 0
            loss_d, grads = jax.lax.cond(
                do_gp,
                lambda a: jax.value_and_grad(make_d_loss(gp_scale))(*a),
                lambda a: jax.value_and_grad(make_d_loss(-1.0))(*a),
                (d_opt_params, dkey))
        else:
            loss_d, grads = jax.value_and_grad(
                make_d_loss(config.gp_lambda))(d_opt_params, dkey)
        return grads, loss_d

    # ---------------------------------------------------- program 2: clip
    def clip_step(grads):
        gp_quar = None
        if config.gp_quarantine and config.gp_lambda > 0:
            g_gp, gp_quar = _quarantine_nonfinite(grads["gp"])
            grads = jax.tree.map(jnp.add, grads["main"], g_gp)
        norm = optax.global_norm(grads)
        if config.clip_grad:
            grads = _clip_by_norm(grads, norm, config.clip_grad)
        return grads, (norm if gp_quar is None else (norm, gp_quar))

    # ------------------------------------- program 3: updates + G phase
    def apply_step(state, batch, key, d_grads, d_grad_norm, loss_d):
        gp_quar = None
        if config.gp_quarantine and config.gp_lambda > 0:
            # unpack the quarantine payloads (see d_grad_step/clip_step) and
            # sanitize the carried GP loss VALUE the same way its gradient
            # was: a non-finite GP value must not trip the host loss-abort
            # when the quarantine already contained the damage
            d_grad_norm, gp_quar = d_grad_norm
            loss_main, loss_gp = loss_d
            ok_v = jnp.isfinite(loss_gp)
            gp_quar = gp_quar + jnp.where(ok_v, 0, 1).astype(jnp.int32)
            loss_d = loss_main + jnp.where(ok_v, loss_gp, 0.0)
        p = prelude(state, batch, key)
        z, k_gen, k_g = p["z"], p["k_gen"], p["k_g"]
        has_cond, cond_scales_g = p["has_cond"], p["cond_scales"]

        d_opt_params = d_opt_params_of(state)
        updates, opt_d_state = optD.update(d_grads, state.opt_d_state,
                                           d_opt_params)
        d_opt_params = optax.apply_updates(d_opt_params, updates)
        new_d_vars = tuple(_merge_vars(v, q)
                           for v, q in zip(state.d_vars, d_opt_params["d"]))
        txt_params = d_opt_params.get(
            "txt", None if state.txt_vars is None else state.txt_vars["params"])

        # G phase — same structure as the fused step's (end2end re-encode,
        # shared single-vjp forward when eligible, multi-gen_steps loop
        # otherwise); see build_train_step for the line-by-line rationale.
        txt_grads_in_g = (config.end2end and config.end2end_txt_in_g
                          and has_cond)
        g_opt_params = {"g": state.g_vars["params"]}
        if txt_grads_in_g and state.txt_vars is not None:
            g_opt_params["txt"] = txt_params

        shared = (config.shared_gen_fwd and config.gen_steps == 1
                  and not (config.end2end and has_cond))
        real_preds_const = None
        if not txt_grads_in_g:
            if config.end2end and has_cond:
                cond_g = jax.lax.stop_gradient(gan.encode(
                    _merge_vars(state.txt_vars, txt_params),
                    batch["captions"], batch["lengths"]))
                real_scales_g, cond_scales_g = scales_for(
                    p["x"], cond_g, p["k_pyr"])
            else:
                real_scales_g = p["real_scales"]
            real_preds_const = jax.lax.stop_gradient(gan.all_discrim_forward(
                new_d_vars, real_scales=real_scales_g,
                cond_scales=cond_scales_g, loss=None, key=None,
                m_vars=state.m_vars, train=True)[2])

        def g_loss_fn(opt_params, gkey):
            g_vars = _merge_vars(state.g_vars, opt_params["g"])
            if txt_grads_in_g:
                cond = gan.encode(
                    _merge_vars(state.txt_vars, opt_params["txt"]),
                    batch["captions"], batch["lengths"])
                real_scales, cond_scales = scales_for(p["x"], cond, p["k_pyr"])
                real_preds = gan.all_discrim_forward(
                    new_d_vars, real_scales=real_scales,
                    cond_scales=cond_scales, loss=None, key=None,
                    m_vars=state.m_vars, train=True)[2]
                gen_cond = cond_scales[0] if cond_scales is not None else None
            else:
                real_preds = real_preds_const
                cond_scales = cond_scales_g
                gen_cond = cond_scales[0] if cond_scales is not None else None
            fakes, g_stats = gan.generate(g_vars, z, cond=gen_cond, key=gkey,
                                          train=True, with_stats=True)
            total = gan.gen_loss(new_d_vars, fakes, real_preds,
                                 cond_scales=cond_scales, loss=losses,
                                 m_vars=state.m_vars, train=True)
            if config.mean_gen_loss:
                total = total / config.gen_steps
            return total, g_stats

        opt_g_state = state.opt_g_state
        total_g_loss = 0.0
        g_grad_norm = jnp.zeros((), jnp.float32)
        g_stats = state.g_vars.get("batch_stats")
        if shared:
            def gen_fwd(g_params):
                return gan.generate(_merge_vars(state.g_vars, g_params), z,
                                    cond=p["cond_const"], key=k_gen,
                                    train=True, with_stats=True)
            fake_scales_live, vjp_fake, shared_stats = jax.vjp(
                gen_fwd, state.g_vars["params"], has_aux=True)

            def g_loss_from_fakes(fakes):
                total = gan.gen_loss(new_d_vars, fakes, real_preds_const,
                                     cond_scales=cond_scales_g, loss=losses,
                                     m_vars=state.m_vars, train=True)
                if config.mean_gen_loss:
                    total = total / config.gen_steps
                return total

            loss_g, dfakes = jax.value_and_grad(g_loss_from_fakes)(
                fake_scales_live)
            (g_param_grads,) = vjp_fake(dfakes)
            grads = {"g": g_param_grads}
            grads, g_grad_norm = _norm_and_clip(grads, config.clip_grad)
            updates, opt_g_state = optG.update(grads, opt_g_state,
                                               g_opt_params)
            g_opt_params = optax.apply_updates(g_opt_params, updates)
            total_g_loss = loss_g
            if shared_stats:
                g_stats = shared_stats["batch_stats"]
        else:
            for j in range(config.gen_steps):
                gkey = k_gen if j == 0 else jax.random.fold_in(k_g, j)
                (loss_g, new_stats), grads = jax.value_and_grad(
                    g_loss_fn, has_aux=True)(g_opt_params, gkey)
                grads, g_grad_norm = _norm_and_clip(grads, config.clip_grad)
                updates, opt_g_state = optG.update(grads, opt_g_state,
                                                   g_opt_params)
                g_opt_params = optax.apply_updates(g_opt_params, updates)
                total_g_loss = total_g_loss + loss_g
                if new_stats:
                    g_stats = new_stats["batch_stats"]

        new_g_vars = _merge_vars(state.g_vars, g_opt_params["g"])
        if g_stats is not None:
            new_g_vars["batch_stats"] = g_stats

        new_txt_vars = state.txt_vars
        if config.end2end and state.txt_vars is not None:
            new_txt_vars = _merge_vars(state.txt_vars,
                                       g_opt_params.get("txt", txt_params))

        new_state = state.replace(
            step=state.step + 1,
            g_vars=new_g_vars, d_vars=new_d_vars, txt_vars=new_txt_vars,
            opt_g_state=opt_g_state, opt_d_state=opt_d_state)
        metrics = {"loss_d": loss_d, "loss_g": total_g_loss,
                   "grad_norm_d": d_grad_norm, "grad_norm_g": g_grad_norm}
        if gp_quar is not None:
            metrics["gp_quarantined"] = gp_quar
        return new_state, metrics

    return d_grad_step, clip_step, apply_step
