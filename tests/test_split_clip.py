"""Split-dispatch clipping (--clip_grad_split, gan/train_step.py
build_split_train_step): the D backward, the clip math, and the update+G
phase compiled as THREE separate XLA programs — the workaround for the TPU
shape where any fused clip formulation miscompiles the D backward
(RESULTS.md round 3, queues 14-18). These tests pin the split composition
numerically equal to the fused in-step clip (TrainConfig.clip_grad) so the
workaround cannot silently diverge from the semantics it exists to preserve."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from txt2vid_tpu.gan import losses as L
from txt2vid_tpu.gan.cond_gan import CondGan
from txt2vid_tpu.gan.train_step import (TrainConfig, build_split_train_step,
                                        build_train_step, init_state)
from txt2vid_tpu.models import tganv2
from txt2vid_tpu.models.txt import Seq2Seq


def rel_l2(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    denom = np.linalg.norm(a) + 1e-12
    return float(np.linalg.norm(a - b) / denom)


def assert_trees_close(ta, tb, atol=1e-6, rtol=1e-3):
    # Not bitwise: the split programs are separately-compiled XLA programs, so
    # the G backward (a fresh value_and_grad in program 3 vs the fused step's
    # shared vjp) reassociates differently — measured 2.4e-5 rel on |g|G at
    # step 0, amplified ~1e-3 by step 2 of the chaotic GAN dynamics. The atol
    # floor absorbs the exact-zero-gradient leaves (conv biases feeding
    # BatchNorm, values ~1e-12 of pure noise) as in TestSharedGenFwd. A
    # semantic divergence — wrong key, wrong batch, wrong update order —
    # shows up as O(1) relative error on the large leaves.
    la, sa = jax.tree_util.tree_flatten(ta)
    lb, sb = jax.tree_util.tree_flatten(tb)
    assert sa == sb
    for x, y in zip(la, lb):
        if hasattr(x, "dtype") and np.issubdtype(np.asarray(x).dtype,
                                                 np.floating):
            np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                       atol=atol, rtol=rtol)
        else:
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def make_cond_flagship_analog():
    """Tiny analog of the 3-scale cond-128 flagship (the shape whose fused
    clip program miscompiles on TPU): conditional, frozen encoder, proj head,
    subsample_input, gradient penalty, in-step clip, shared generator fwd."""
    enc = Seq2Seq(vocab_size=20, embed_size=8, hidden_size=16, num_layers=1)
    gen = tganv2.MultiScaleGen(latent_size=16, width=16, height=16,
                               num_channels=1, fm_channels=16,
                               additional_blocks=(8,), num_frames=4,
                               cond_dim=16, use_pallas=False)
    discrim = tganv2.MultiScaleDiscrim(discrim_down_blocks=(1, 1),
                                       num_channels=1, cond_dim=16,
                                       with_attn=False, cond_head="proj",
                                       use_pallas=False)
    gan = CondGan(gen=gen, discrims=[discrim], cond_encoder=enc)
    cfg = TrainConfig(frame_sizes=(8, 16), subsample_input=True,
                      latent_size=16, gp_lambda=1.0, clip_grad=0.5,
                      shared_gen_fwd=True)
    rng = np.random.default_rng(0)
    batch = {
        "video": jnp.asarray(rng.integers(0, 255, (4, 4, 16, 16, 1)),
                             jnp.uint8),
        "captions": jnp.array([[1, 4, 5, 2]] * 4, jnp.int32),
        "lengths": jnp.array([4] * 4),
    }
    # SGD, not Adam, for the same reason as TestSharedGenFwd: Adam's
    # 1/sqrt(nu) turns f32 reassociation noise on exact-zero-gradient leaves
    # into full-size random steps, making the tree comparison vacuous. With
    # SGD, param deltas are proportional to the (clipped) gradients — the
    # thing this test actually pins.
    optG = optax.sgd(1e-3)
    optD = optax.sgd(1e-3)
    return gan, cfg, batch, optG, optD


class TestSplitEqualsFused:
    def test_cond_gp_clip_two_steps(self):
        gan, cfg, batch, optG, optD = make_cond_flagship_analog()
        state0 = init_state(gan, jax.random.key(0), batch, optG, optD, cfg)

        fused = jax.jit(build_train_step(gan, L.RSGANLoss(), optG, optD, cfg))
        d_grad, clip, apply_ = build_split_train_step(
            gan, L.RSGANLoss(), optG, optD, cfg)
        jd, jc, ja = jax.jit(d_grad), jax.jit(clip), jax.jit(apply_)

        def split_step(state, b, key):
            grads, loss_d = jd(state, b, key)
            grads, norm = jc(grads)
            return ja(state, b, key, grads, norm, loss_d)

        sf, sm = state0, None
        ss, smm = state0, None
        for i in range(2):
            key = jax.random.key(7 + i)
            sf, sm = fused(sf, batch, key)
            ss, smm = split_step(ss, batch, key)

        # the clip must actually bind somewhere, or the test proves nothing
        assert (float(sm["grad_norm_d"]) > cfg.clip_grad
                or float(sm["grad_norm_g"]) > cfg.clip_grad)
        for k in ("loss_d", "loss_g", "grad_norm_d", "grad_norm_g"):
            assert abs(float(sm[k]) - float(smm[k])) < 2e-3 * (
                1.0 + abs(float(sm[k]))), (k, sm[k], smm[k])
        assert int(ss.step) == 2
        assert_trees_close(sf.g_vars, ss.g_vars)
        assert_trees_close(sf.d_vars, ss.d_vars)
        assert_trees_close(sf.opt_g_state, ss.opt_g_state)
        assert_trees_close(sf.opt_d_state, ss.opt_d_state)

    def test_device_data_split_matches_fused(self):
        """The --device_data composition (data/device_cache.py
        jit_device_data_split): programs 1 and 3 each re-assemble the batch on
        device from (key, state.step) — the same fold-in as the fused
        jit_device_data_step, so the whole split run must track the fused run."""
        from txt2vid_tpu.data.device_cache import (DeviceVideoData,
                                                   jit_device_data_split,
                                                   jit_device_data_step)
        from txt2vid_tpu.parallel.mesh import make_mesh

        gen = tganv2.MultiScaleGen(latent_size=16, width=16, height=16,
                                   num_channels=1, fm_channels=16,
                                   additional_blocks=(8,), num_frames=4,
                                   use_pallas=False)
        discrim = tganv2.MultiScaleDiscrim(discrim_down_blocks=(1, 1),
                                           num_channels=1, with_attn=False,
                                           use_pallas=False)
        gan = CondGan(gen=gen, discrims=[discrim])
        cfg = TrainConfig(frame_sizes=(8, 16), subsample_input=True,
                          latent_size=16, clip_grad=0.5)
        optG = optax.sgd(1e-3)
        optD = optax.sgd(1e-3)

        rng = np.random.default_rng(1)
        vids = rng.integers(0, 255, (10, 8, 16, 16, 1)).astype(np.uint8)
        data = DeviceVideoData(vids, np.arange(10), None, None, num_frames=4)
        mesh = make_mesh(n_devices=8)
        batch0 = data.host_batch(np.arange(8))
        state0 = init_state(gan, jax.random.key(0), batch0, optG, optD, cfg)

        fused_run = jit_device_data_step(
            build_train_step(gan, L.RSGANLoss(), optG, optD, cfg),
            data, mesh, batch_size=8)
        split_run = jit_device_data_split(
            *build_split_train_step(gan, L.RSGANLoss(), optG, optD, cfg),
            data, mesh, batch_size=8)

        # both jitted paths donate the state — hand each its own host snapshot
        state_np = jax.tree.map(np.asarray, state0)
        key = jax.random.key(3)
        sf, sm = fused_run(state_np, None, key)
        ss, smm = split_run(jax.tree.map(np.copy, state_np), None, key)
        for k in ("loss_d", "loss_g"):
            assert abs(float(sm[k]) - float(smm[k])) < 1e-4 * (
                1.0 + abs(float(sm[k]))), (k, sm[k], smm[k])
        assert_trees_close(sf.g_vars, ss.g_vars)
        assert_trees_close(sf.d_vars, ss.d_vars)


class TestGpQuarantine:
    """--gp_quarantine (TrainConfig.gp_quarantine): the GP term's gradient is
    a separate vjp whose non-finite leaves are zeroed per-leaf, keeping the
    main-loss D gradient. Pins (a) the healthy-path decomposition exactly
    equal to the fused gp term (main + gp_only == both, for loss and params),
    (b) the poisoned path: a GP whose gradient is NaN costs only its own
    leaves — the step's params stay finite and equal the main-only update —
    and the quarantine counter reports it."""

    def test_quarantine_equals_fused_when_finite(self):
        import dataclasses
        gan, cfg, batch, optG, optD = make_cond_flagship_analog()
        cfg = dataclasses.replace(cfg, clip_grad=0.0)
        cfg_q = dataclasses.replace(cfg, gp_quarantine=True)
        state0 = init_state(gan, jax.random.key(0), batch, optG, optD, cfg)

        fused = jax.jit(build_train_step(gan, L.RSGANLoss(), optG, optD, cfg))
        quar = jax.jit(build_train_step(gan, L.RSGANLoss(), optG, optD, cfg_q))

        sf, sq = state0, state0
        for i in range(2):
            key = jax.random.key(11 + i)
            sf, mf = fused(sf, batch, key)
            sq, mq = quar(sq, batch, key)

        assert int(mq["gp_quarantined"]) == 0
        assert "gp_quarantined" not in mf
        for k in ("loss_d", "loss_g", "grad_norm_d", "grad_norm_g"):
            assert abs(float(mf[k]) - float(mq[k])) < 2e-3 * (
                1.0 + abs(float(mf[k]))), (k, mf[k], mq[k])
        assert_trees_close(sf.g_vars, sq.g_vars)
        assert_trees_close(sf.d_vars, sq.d_vars)

    def test_split_quarantine_equals_fused_when_finite(self):
        import dataclasses
        gan, cfg, batch, optG, optD = make_cond_flagship_analog()
        cfg_q = dataclasses.replace(cfg, gp_quarantine=True)
        state0 = init_state(gan, jax.random.key(0), batch, optG, optD, cfg)

        fused = jax.jit(build_train_step(gan, L.RSGANLoss(), optG, optD, cfg))
        d_grad, clip, apply_ = build_split_train_step(
            gan, L.RSGANLoss(), optG, optD, cfg_q)
        jd, jc, ja = jax.jit(d_grad), jax.jit(clip), jax.jit(apply_)

        def split_step(state, b, key):
            grads, loss_d = jd(state, b, key)
            grads, norm = jc(grads)
            return ja(state, b, key, grads, norm, loss_d)

        sf, ss = state0, state0
        for i in range(2):
            key = jax.random.key(7 + i)
            sf, mf = fused(sf, batch, key)
            ss, ms = split_step(ss, batch, key)

        assert int(ms["gp_quarantined"]) == 0
        for k in ("loss_d", "loss_g", "grad_norm_d", "grad_norm_g"):
            assert abs(float(mf[k]) - float(ms[k])) < 2e-3 * (
                1.0 + abs(float(mf[k]))), (k, mf[k], ms[k])
        assert_trees_close(sf.d_vars, ss.d_vars)
        assert_trees_close(sf.g_vars, ss.g_vars)

    @staticmethod
    def _poison_gp(gan):
        """Replace the GP with a term whose VALUE is finite (0) but whose
        theta_D-gradient is NaN — sqrt at 0 has an infinite derivative, and
        the zero cotangent turns it into inf*0 = nan — the queue-19 wall's
        exact fingerprint (finite loss, non-finite D-param gradient)."""
        import types

        def bad_gp(self, i, d_vars, key, *a, **k):
            leaf = jax.tree_util.tree_leaves(d_vars["params"])[0]
            return jnp.sqrt(jnp.sum(leaf * 0.0))

        gan._gradient_penalty = types.MethodType(bad_gp, gan)

    def test_quarantine_contains_poisoned_gp(self):
        import dataclasses
        gan, cfg, batch, optG, optD = make_cond_flagship_analog()
        cfg = dataclasses.replace(cfg, clip_grad=0.0)
        cfg_q = dataclasses.replace(cfg, gp_quarantine=True)
        cfg_nogp = dataclasses.replace(cfg, gp_lambda=-1.0)
        state0 = init_state(gan, jax.random.key(0), batch, optG, optD, cfg)

        self._poison_gp(gan)
        quar = jax.jit(build_train_step(gan, L.RSGANLoss(), optG, optD, cfg_q))
        nogp = jax.jit(build_train_step(gan, L.RSGANLoss(), optG, optD,
                                        cfg_nogp))
        key = jax.random.key(5)
        sq, mq = quar(state0, batch, key)
        sn, mn = nogp(state0, batch, key)

        assert int(mq["gp_quarantined"]) >= 1
        # params stay finite and equal the main-only update: the poisoned GP
        # gradient was zeroed, not propagated
        for leaf in jax.tree_util.tree_leaves(sq.d_vars):
            assert np.all(np.isfinite(np.asarray(leaf)))
        assert_trees_close(sn.d_vars, sq.d_vars)
        # the poisoned GP's value is 0 here, so losses agree too
        assert abs(float(mq["loss_d"]) - float(mn["loss_d"])) < 1e-5

    def test_split_quarantine_contains_poisoned_gp(self):
        import dataclasses
        gan, cfg, batch, optG, optD = make_cond_flagship_analog()
        cfg_q = dataclasses.replace(cfg, gp_quarantine=True)
        state0 = init_state(gan, jax.random.key(0), batch, optG, optD, cfg)

        self._poison_gp(gan)
        d_grad, clip, apply_ = build_split_train_step(
            gan, L.RSGANLoss(), optG, optD, cfg_q)
        jd, jc, ja = jax.jit(d_grad), jax.jit(clip), jax.jit(apply_)
        key = jax.random.key(5)
        grads, loss_d = jd(state0, batch, key)
        # the D-backward program carries main and gp as separate trees
        assert set(grads.keys()) == {"main", "gp"}
        grads, norm = jc(grads)
        ss, ms = ja(state0, batch, key, grads, norm, loss_d)

        assert int(ms["gp_quarantined"]) >= 1
        assert np.isfinite(float(ms["grad_norm_d"]))
        for leaf in jax.tree_util.tree_leaves(ss.d_vars):
            assert np.all(np.isfinite(np.asarray(leaf)))

    def test_quarantine_nonfinite_unit(self):
        from txt2vid_tpu.gan.train_step import _quarantine_nonfinite
        tree = {"a": jnp.array([1.0, 2.0]),
                "b": jnp.array([np.nan, 1.0]),
                "c": jnp.array([np.inf]),
                "d": jnp.array([3.0])}
        out, n = jax.jit(_quarantine_nonfinite)(tree)
        assert int(n) == 2
        np.testing.assert_array_equal(np.asarray(out["a"]), [1.0, 2.0])
        np.testing.assert_array_equal(np.asarray(out["b"]), [0.0, 0.0])
        np.testing.assert_array_equal(np.asarray(out["c"]), [0.0])
        np.testing.assert_array_equal(np.asarray(out["d"]), [3.0])
