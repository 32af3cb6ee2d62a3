"""End-to-end jitted train-step tests at tiny sizes: the functional equivalent of the
reference's trainer hot loop (gan/trainer.py:190-333) must run, update params, and
produce finite losses for each model family."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from txt2vid_tpu.gan import losses as L
from txt2vid_tpu.gan.cond_gan import CondGan
from txt2vid_tpu.gan.train_step import TrainConfig, build_train_step, init_state
from txt2vid_tpu.models import tganv2, tcwyt, img
from txt2vid_tpu.models.txt import Seq2Seq


def make_opts():
    return optax.adam(2e-4, b1=0.5, b2=0.999), optax.adam(2e-4, b1=0.5, b2=0.999)


def params_differ(a, b):
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    return any(not np.allclose(np.asarray(x), np.asarray(y))
               for x, y in zip(leaves_a, leaves_b))


class TestUncondTGANv2:
    def test_two_steps(self):
        # sizes chosen to bound CPU-XLA compile time: 2 scales, no discrim attention,
        # no GP (GP is covered by TestImgWGAN and tests/test_losses.py)
        gen = tganv2.MultiScaleGen(latent_size=16, width=16, height=16, num_channels=1,
                                   fm_channels=16, additional_blocks=(8,),
                                   num_frames=4, use_pallas=False)
        discrim = tganv2.MultiScaleDiscrim(discrim_down_blocks=(1, 1),
                                           num_channels=1, with_attn=False,
                                           use_pallas=False)
        gan = CondGan(gen=gen, discrims=[discrim])
        cfg = TrainConfig(frame_sizes=(8, 16), subsample_input=True, latent_size=16)
        optG, optD = make_opts()
        batch = {"video": jnp.zeros((4, 4, 16, 16, 1))}
        state = init_state(gan, jax.random.key(0), batch, optG, optD, cfg)
        step = jax.jit(build_train_step(gan, L.RSGANLoss(), optG, optD, cfg))

        s1, m1 = step(state, batch, jax.random.key(1))
        s2, m2 = step(s1, batch, jax.random.key(2))
        assert np.isfinite(float(m1["loss_d"])) and np.isfinite(float(m1["loss_g"]))
        # pre-clip global grad norms are first-class metrics (blow-up forensics)
        assert float(m1["grad_norm_d"]) > 0 and np.isfinite(float(m1["grad_norm_d"]))
        assert float(m1["grad_norm_g"]) > 0 and np.isfinite(float(m1["grad_norm_g"]))
        assert int(s2.step) == 2
        assert params_differ(state.g_vars["params"], s2.g_vars["params"])
        assert params_differ(state.d_vars[0]["params"], s2.d_vars[0]["params"])


class TestClipGrad:
    def test_global_norm_clip_bounds_updates(self):
        """--clip_grad clips inside the train step (TrainConfig.clip_grad),
        reusing the grad-norm metric's reduction and leaving the optimizer
        state structure unchanged. Verified through the real train step with
        unit-lr SGD, where the bound is directly observable: the applied G
        update's global norm must equal min(grad_norm, clip) — i.e. <= clip
        when it binds — and be far below the unclipped update."""
        def run(clip):
            gen = tganv2.MultiScaleGen(latent_size=16, width=16, height=16,
                                       num_channels=1, fm_channels=16,
                                       additional_blocks=(8,), num_frames=4,
                                       use_pallas=False)
            discrim = tganv2.MultiScaleDiscrim(discrim_down_blocks=(1, 1),
                                               num_channels=1, with_attn=False,
                                               use_pallas=False)
            gan = CondGan(gen=gen, discrims=[discrim])
            cfg = TrainConfig(frame_sizes=(8, 16), subsample_input=True,
                              latent_size=16,
                              clip_grad=0.0 if clip is None else clip)
            optG = optax.sgd(1.0)
            optD = optax.sgd(1.0)
            batch = {"video": jnp.zeros((4, 4, 16, 16, 1))}
            state = init_state(gan, jax.random.key(0), batch, optG, optD, cfg)
            step = jax.jit(build_train_step(gan, L.RSGANLoss(), optG, optD, cfg))
            s1, m1 = step(state, batch, jax.random.key(1))
            assert np.isfinite(float(m1["loss_d"]))
            delta = jnp.sqrt(sum(
                jnp.sum((a - b).astype(jnp.float32) ** 2)
                for a, b in zip(jax.tree_util.tree_leaves(state.g_vars["params"]),
                                jax.tree_util.tree_leaves(s1.g_vars["params"]))))
            return float(delta)

        unclipped = run(None)
        clip = 1e-3
        clipped = run(clip)
        assert unclipped > 10 * clip, unclipped  # the clip genuinely binds here
        assert clipped <= clip * 1.01, (clipped, clip)

    def test_nonfinite_norm_zeroes_update(self):
        """A non-finite gradient norm must zero the update (step becomes a
        no-op for the phase) rather than propagate NaN into the params —
        one poisoned backward costs a step, not the run."""
        from txt2vid_tpu.gan.train_step import _clip_by_norm
        grads = {"w": jnp.array([jnp.inf, 1.0]), "b": jnp.array([2.0])}
        norm = optax.global_norm(grads)           # inf
        out = _clip_by_norm(grads, norm, 50.0)
        assert float(jnp.abs(out["w"]).max()) == 0.0
        assert float(jnp.abs(out["b"]).max()) == 0.0
        # finite norm above the clip scales exactly onto the bound
        grads = {"w": jnp.array([3.0, 4.0])}      # norm 5
        out = _clip_by_norm(grads, optax.global_norm(grads), 1.0)
        assert abs(float(optax.global_norm(out)) - 1.0) < 1e-6


class TestCondTCWYT:
    def test_end2end_with_encoder_and_mapping(self):
        vocab_size = 20
        enc = Seq2Seq(vocab_size=vocab_size, embed_size=8, hidden_size=16, num_layers=1)
        gen = tcwyt.Gen(z_size=8, cond_dim=16, num_channels=1)
        vd = tcwyt.VideoDiscrim(cond_dim=16, mid_ch=4, num_channels=1)
        fd = tcwyt.FrameDiscrim(cond_dim=16)
        md = tcwyt.MotionDiscrim(cond_dim=16)
        fmap = tcwyt.FrameMap(num_channels=1)
        gan = CondGan(gen=gen, discrims=[vd, fd, md],
                      discrim_names=["video", "frame", "motion"],
                      cond_encoder=enc, sample_mapping=fmap)
        cfg = TrainConfig(frame_sizes=(48,), latent_size=8, end2end=True)
        optG, optD = make_opts()
        batch = {
            "video": jnp.zeros((2, 16, 48, 48, 1)),
            "captions": jnp.array([[1, 4, 5, 2], [1, 6, 7, 2]], dtype=jnp.int32),
            "lengths": jnp.array([4, 4]),
        }
        state = init_state(gan, jax.random.key(0), batch, optG, optD, cfg)
        step = jax.jit(build_train_step(gan, L.RaLSGANLoss(), optG, optD, cfg))
        s1, m1 = step(state, batch, jax.random.key(1))
        assert np.isfinite(float(m1["loss_d"])) and np.isfinite(float(m1["loss_g"]))
        # encoder trained end2end (reference train/gan.py:82-85)
        assert params_differ(state.txt_vars["params"], s1.txt_vars["params"])
        # sample mapping M stays frozen (its params are in neither reference optimizer)
        assert not params_differ(state.m_vars["params"], s1.m_vars["params"])


class TestFmStrideShallowPyramid:
    def test_cond_3scale_fm_stride_full_step(self):
        # Tiny analog of the 3-scale 128px recipe (RESULTS.md round 3 /
        # scripts/r3_queue9.sh phase B): fm_stride overrides the reference's
        # hardcoded width//64 latent-plane downscale (tganv2/gen.py:31) so a
        # 3-scale pyramid honors `width`. Full conditional train step: frozen
        # encoder, proj head, subsample_input, gradient penalty — a structural
        # bug in the fm_stride pyramid must fail HERE, not on hardware.
        enc = Seq2Seq(vocab_size=20, embed_size=8, hidden_size=16, num_layers=1)
        gen = tganv2.MultiScaleGen(latent_size=16, width=32, height=32,
                                   num_channels=1, fm_channels=16,
                                   additional_blocks=(8, 8), fm_stride=32,
                                   num_frames=4, cond_dim=16,
                                   with_non_local=True, use_pallas=False)
        discrim = tganv2.MultiScaleDiscrim(discrim_down_blocks=(1, 1, 1),
                                           num_channels=1, cond_dim=16,
                                           with_attn=False, cond_head="proj",
                                           use_pallas=False)
        gan = CondGan(gen=gen, discrims=[discrim], cond_encoder=enc)
        cfg = TrainConfig(frame_sizes=(8, 16, 32), subsample_input=True,
                          gp_lambda=1.0, latent_size=16)
        optG, optD = make_opts()
        batch = {
            "video": jnp.zeros((4, 4, 32, 32, 1)),
            "captions": jnp.array([[1, 4, 5, 2]] * 4, dtype=jnp.int32),
            "lengths": jnp.array([4, 4, 4, 4]),
        }
        state = init_state(gan, jax.random.key(0), batch, optG, optD, cfg)
        step = jax.jit(build_train_step(gan, L.RSGANLoss(), optG, optD, cfg))
        s1, m1 = step(state, batch, jax.random.key(1))
        assert np.isfinite(float(m1["loss_d"])) and np.isfinite(float(m1["loss_g"]))
        assert params_differ(state.g_vars["params"], s1.g_vars["params"])
        assert params_differ(state.d_vars[0]["params"], s1.d_vars[0]["params"])


class TestImgWGAN:
    def test_wgan_gp_multi_dstep(self):
        gen = img.Gen(dim=8)
        discrim = img.Discrim(dim=8)
        gan = CondGan(gen=gen, discrims=[discrim])
        cfg = TrainConfig(frame_sizes=(64,), img_model=True, latent_size=128,
                          discrim_steps=2, gp_lambda=10.0)
        optG, optD = make_opts()
        batch = {"video": jnp.zeros((4, 64, 64, 3))}
        state = init_state(gan, jax.random.key(0), batch, optG, optD, cfg)
        step = jax.jit(build_train_step(gan, L.WassersteinGanLoss(), optG, optD, cfg))
        s1, m1 = step(state, batch, jax.random.key(1))
        assert np.isfinite(float(m1["loss_d"]))
        assert params_differ(state.g_vars["params"], s1.g_vars["params"])


class TestBf16:
    def test_bf16_train_step(self):
        import jax.numpy as jnp
        gen = tganv2.MultiScaleGen(latent_size=16, width=16, height=16, num_channels=1,
                                   fm_channels=16, additional_blocks=(8,),
                                   num_frames=4, use_pallas=False,
                                   dtype=jnp.bfloat16)
        discrim = tganv2.MultiScaleDiscrim(discrim_down_blocks=(1, 1), num_channels=1,
                                           with_attn=False, use_pallas=False,
                                           dtype=jnp.bfloat16)
        gan = CondGan(gen=gen, discrims=[discrim])
        cfg = TrainConfig(frame_sizes=(8, 16), subsample_input=True, latent_size=16)
        optG, optD = make_opts()
        batch = {"video": jnp.zeros((4, 4, 16, 16, 1))}
        state = init_state(gan, jax.random.key(0), batch, optG, optD, cfg)
        # params stay f32 even with bf16 compute
        leaf = jax.tree_util.tree_leaves(state.g_vars["params"])[0]
        assert leaf.dtype == jnp.float32
        step = jax.jit(build_train_step(gan, L.RSGANLoss(), optG, optD, cfg))
        s1, m1 = step(state, batch, jax.random.key(1))
        assert np.isfinite(float(m1["loss_d"])) and np.isfinite(float(m1["loss_g"]))
        assert params_differ(state.g_vars["params"], s1.g_vars["params"])


class TestBf16Params:
    def test_compute_dtype_copy_matches_per_use_casts(self):
        """--bf16_params (TrainConfig.compute_dtype): with bf16-compute models,
        the per-step materialized bf16 param copy must be numerically CLOSE to
        the default per-use-cast path (same rounding, different traffic), keep
        stored params f32, and keep gradients/updates finite. The two paths
        quantize weights identically (astype at use vs astype once), so the
        losses agree to bf16 resolution."""
        import jax.numpy as jnp
        gen = tganv2.MultiScaleGen(latent_size=16, width=16, height=16,
                                   num_channels=1, fm_channels=16,
                                   additional_blocks=(8,), num_frames=4,
                                   use_pallas=False, dtype=jnp.bfloat16)
        discrim = tganv2.MultiScaleDiscrim(discrim_down_blocks=(1, 1),
                                           num_channels=1, with_attn=False,
                                           use_pallas=False,
                                           dtype=jnp.bfloat16)
        gan = CondGan(gen=gen, discrims=[discrim])
        optG, optD = make_opts()
        rng = np.random.default_rng(4)
        batch = {"video": jnp.asarray(
            rng.standard_normal((4, 4, 16, 16, 1)).clip(-1, 1), jnp.float32)}

        results = {}
        for name, cd in (("per_use", None), ("copy", jnp.bfloat16)):
            cfg = TrainConfig(frame_sizes=(8, 16), subsample_input=True,
                              latent_size=16, shared_gen_fwd=True,
                              compute_dtype=cd)
            state = init_state(gan, jax.random.key(0), batch, optG, optD, cfg)
            step = jax.jit(build_train_step(gan, L.RSGANLoss(), optG, optD,
                                            cfg))
            s1, m1 = step(state, batch, jax.random.key(1))
            # stored params stay f32 masters
            for leaf in jax.tree_util.tree_leaves(s1.g_vars["params"]):
                assert leaf.dtype == jnp.float32
            results[name] = (s1, m1)

        (sa, ma), (sb, mb) = results["per_use"], results["copy"]
        assert float(ma["loss_d"]) == pytest.approx(float(mb["loss_d"]),
                                                    rel=2e-2)
        assert float(ma["loss_g"]) == pytest.approx(float(mb["loss_g"]),
                                                    rel=2e-2)
        assert np.isfinite(float(mb["grad_norm_d"]))
        assert np.isfinite(float(mb["grad_norm_g"]))
        # the lever changed traffic, not math: per-leaf param agreement after
        # one update stays at bf16-rounding scale
        for a, b in zip(jax.tree_util.tree_leaves(sa.g_vars["params"]),
                        jax.tree_util.tree_leaves(sb.g_vars["params"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-2, atol=5e-3)


class TestMakeFakeConds:
    def test_no_fixed_points_any_batch(self):
        """The mismatched-caption permutation must displace EVERY row for b >= 2,
        at every scale (reference gen_perm semantics, util/misc.py:3-8)."""
        from txt2vid_tpu.models import tcwyt as _tcwyt
        gan = CondGan(gen=_tcwyt.Gen(), discrims=[_tcwyt.VideoDiscrim()],
                      cond_encoder=object())
        for b in (2, 3, 5, 8):
            # rows are distinguishable (row i = constant i)
            cond0 = jnp.tile(jnp.arange(b, dtype=jnp.float32)[:, None], (1, 4))
            scales = [cond0, cond0[: max(b // 2, 1)]]
            for s in range(10):
                fakes = gan.make_fake_conds(scales, jax.random.key(s))
                assert fakes[0].shape == scales[0].shape
                assert fakes[1].shape == scales[1].shape
                matched = np.asarray(fakes[0][:, 0]) == np.arange(b)
                assert not matched.any(), (b, s, np.asarray(fakes[0][:, 0]))

    def test_batch_one_degenerates_gracefully(self):
        from txt2vid_tpu.models import tcwyt as _tcwyt
        gan = CondGan(gen=_tcwyt.Gen(), discrims=[_tcwyt.VideoDiscrim()],
                      cond_encoder=object())
        cond0 = jnp.ones((1, 4))
        fakes = gan.make_fake_conds([cond0], jax.random.key(0))
        assert fakes[0].shape == (1, 4)


class TestProjCondHead:
    def test_proj_head_is_video_caption_interactive(self):
        """The projection head's cond logit must depend on cond AND the dependence
        must vary with the video (bilinear interaction) — the concat head is
        additive in cond, which is exactly why it cannot drive alignment."""
        from txt2vid_tpu.models.resnet3d import Resnet3D

        d = Resnet3D(mid_ch=8, num_down_blocks=1, with_attn=False, cond_dim=8,
                     cond_head="proj", use_pallas=False)
        x1 = jax.random.normal(jax.random.key(0), (2, 4, 16, 16, 1))
        x2 = jax.random.normal(jax.random.key(1), (2, 4, 16, 16, 1))
        c1 = jnp.ones((2, 8))
        c2 = -jnp.ones((2, 8))
        v = d.init(jax.random.key(2), x1, cond=c1, train=True)

        def logit(x, c):
            return np.asarray(d.apply(v, x, cond=c, train=True)[1])

        d1 = logit(x1, c1) - logit(x1, c2)   # cond effect on video 1
        d2 = logit(x2, c1) - logit(x2, c2)   # cond effect on video 2
        assert np.abs(d1).max() > 1e-6       # depends on cond
        assert np.abs(d1 - d2).max() > 1e-6  # interaction: effect differs by video

    def test_concat_head_cond_effect_is_video_independent(self):
        # documents the reference head's limitation the proj head fixes
        from txt2vid_tpu.models.resnet3d import Resnet3D

        d = Resnet3D(mid_ch=8, num_down_blocks=1, with_attn=False, cond_dim=8,
                     cond_head="concat", use_pallas=False)
        x1 = jax.random.normal(jax.random.key(0), (2, 4, 16, 16, 1))
        x2 = jax.random.normal(jax.random.key(1), (2, 4, 16, 16, 1))
        c1 = jnp.ones((2, 8))
        c2 = -jnp.ones((2, 8))
        v = d.init(jax.random.key(2), x1, cond=c1, train=True)

        def logit(x, c):
            return np.asarray(d.apply(v, x, cond=c, train=True)[1])

        d1 = logit(x1, c1) - logit(x1, c2)
        d2 = logit(x2, c1) - logit(x2, c2)
        np.testing.assert_allclose(d1, d2, atol=1e-5)


class TestEnd2EndDOnly:
    def test_encoder_updates_from_d_phase_only(self):
        from txt2vid_tpu.models import tganv2
        enc = Seq2Seq(vocab_size=20, embed_size=8, hidden_size=16, num_layers=1)
        gen = tganv2.MultiScaleGen(latent_size=16, width=16, height=16,
                                   num_channels=1, fm_channels=16,
                                   additional_blocks=(8,), num_frames=4,
                                   cond_dim=16, use_pallas=False)
        dis = tganv2.MultiScaleDiscrim(discrim_down_blocks=(1, 1), num_channels=1,
                                       cond_dim=16, with_attn=False,
                                       use_pallas=False, cond_head="proj")
        gan = CondGan(gen=gen, discrims=[dis], cond_encoder=enc)
        cfg = TrainConfig(frame_sizes=(8, 16), subsample_input=True,
                          latent_size=16, end2end=True, end2end_txt_in_g=False)
        optG, optD = make_opts()
        b = 8
        batch = {
            "video": jnp.asarray(
                np.random.default_rng(0).standard_normal((b, 4, 16, 16, 1))
                .clip(-1, 1), jnp.float32),
            "captions": jnp.tile(jnp.array([[1, 4, 5, 2]], jnp.int32), (b, 1)),
            "lengths": jnp.full((b,), 4, jnp.int32),
        }
        state = init_state(gan, jax.random.key(0), batch, optG, optD, cfg)
        txt0 = jax.device_get(state.txt_vars["params"])
        step = jax.jit(build_train_step(gan, L.RSGANLoss(), optG, optD, cfg))
        s1, m = step(state, batch, jax.random.key(1))
        assert bool(jnp.isfinite(m["loss_d"])) and bool(jnp.isfinite(m["loss_g"]))
        assert params_differ(txt0, s1.txt_vars["params"]), \
            "encoder must still update (via the D optimizer)"
        # the G optimizer state must NOT contain a txt branch
        paths = [jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_leaves_with_path(s1.opt_g_state)]
        assert not any("txt" in p for p in paths), paths[:4]
        # ... while the D optimizer state must
        d_paths = [jax.tree_util.keystr(p) for p, _ in
                   jax.tree_util.tree_leaves_with_path(s1.opt_d_state)]
        assert any("txt" in p for p in d_paths)


class TestSharedGenFwd:
    """shared_gen_fwd computes ONE vjp'd generator forward for both phases; with
    the same (params, z, cond, key) it must match the default two-forward path
    to float32 reassociation noise — same losses, same updated params."""

    def _run(self, cfg_kwargs, cond):
        gen = tganv2.MultiScaleGen(latent_size=16, width=16, height=16,
                                   num_channels=1, fm_channels=16,
                                   additional_blocks=(8,), num_frames=4,
                                   cond_dim=16 if cond else 0, use_pallas=False)
        discrim = tganv2.MultiScaleDiscrim(
            discrim_down_blocks=(1, 1), num_channels=1, with_attn=False,
            cond_dim=16 if cond else 0, use_pallas=False,
            **({"cond_head": "proj"} if cond else {}))
        enc = Seq2Seq(vocab_size=20, embed_size=8, hidden_size=16,
                      num_layers=1) if cond else None
        gan = CondGan(gen=gen, discrims=[discrim], cond_encoder=enc)
        # SGD, not Adam: param deltas are then proportional to the gradients (the
        # thing actually being verified). Adam's 1/sqrt(nu) normalization turns f32
        # reassociation noise on exact-zero-gradient leaves (conv biases feeding
        # BatchNorm) into full-size random steps, making the comparison vacuous.
        optG, optD = optax.sgd(1e-3), optax.sgd(1e-3)
        b = 8
        batch = {"video": jnp.asarray(
            np.random.default_rng(0).standard_normal((b, 4, 16, 16, 1))
            .clip(-1, 1), jnp.float32)}
        if cond:
            batch["captions"] = jnp.tile(jnp.array([[1, 4, 5, 2]], jnp.int32),
                                         (b, 1))
            batch["lengths"] = jnp.full((b,), 4, jnp.int32)

        results = []
        for shared in (False, True):
            cfg = TrainConfig(frame_sizes=(8, 16), subsample_input=True,
                              latent_size=16, shared_gen_fwd=shared,
                              **cfg_kwargs)
            state = init_state(gan, jax.random.key(0), batch, optG, optD, cfg)
            step = jax.jit(build_train_step(gan, L.RSGANLoss(), optG, optD, cfg))
            for i in range(3):
                state, m = step(state, batch, jax.random.key(1))
            results.append((jax.device_get(state), jax.device_get(m)))
        return results

    def _assert_equiv(self, base, shared):
        (s0, m0), (s1, m1) = base, shared
        assert np.isfinite(m1["loss_d"]) and np.isfinite(m1["loss_g"])
        np.testing.assert_allclose(m1["loss_d"], m0["loss_d"], rtol=1e-4)
        np.testing.assert_allclose(m1["loss_g"], m0["loss_g"], rtol=1e-4)
        for name, a, b in [("g", s0.g_vars["params"], s1.g_vars["params"]),
                           ("d", s0.d_vars[0]["params"], s1.d_vars[0]["params"])]:
            for (pa, la), (pb, lb) in zip(
                    jax.tree_util.tree_leaves_with_path(a),
                    jax.tree_util.tree_leaves_with_path(b)):
                la, lb = np.asarray(la), np.asarray(lb)
                # with SGD, deltas = lr*grad, so this bounds gradient disagreement
                # directly; tolerance = f32 reassociation noise over 3 steps
                np.testing.assert_allclose(
                    lb, la, atol=1e-6, rtol=1e-4,
                    err_msg=f"{name}{jax.tree_util.keystr(pa)}")

    def test_uncond_equivalence(self):
        self._assert_equiv(*self._run({}, cond=False))

    def test_cond_frozen_encoder_equivalence(self):
        self._assert_equiv(*self._run({}, cond=True))

    def test_falls_back_when_end2end(self):
        # end2end + captions: the G phase conditions on the D-updated encoder, so
        # sharing is invalid; the config must silently use the two-forward path
        (s0, m0), (s1, m1) = self._run({"end2end": True}, cond=True)
        np.testing.assert_allclose(m1["loss_d"], m0["loss_d"], rtol=1e-4)
        np.testing.assert_allclose(m1["loss_g"], m0["loss_g"], rtol=1e-4)


class TestLazyGP:
    """--gp_every k (StyleGAN2 lazy regularization): the GP fires on
    step % k == 0 with weight k*lambda, and is skipped entirely otherwise.
    Semantics pinned by exact one-step equivalence: an on-step of
    (gp_every=2, lambda/2) must reproduce (gp_every=1, lambda), and an
    off-step must reproduce gp_lambda=-1 (no GP at all)."""

    def _setup(self):
        gen = img.Gen(dim=8)
        discrim = img.Discrim(dim=8)
        gan = CondGan(gen=gen, discrims=[discrim])
        optG, optD = make_opts()
        rng = np.random.default_rng(3)
        batch = {"video": jnp.asarray(
            rng.standard_normal((4, 64, 64, 3), dtype=np.float32).clip(-1, 1))}
        return gan, optG, optD, batch

    def _one_step(self, gan, optG, optD, batch, step_counter, **cfg_kwargs):
        cfg = TrainConfig(frame_sizes=(64,), img_model=True, latent_size=128,
                          **cfg_kwargs)
        state = init_state(gan, jax.random.key(0), batch, optG, optD, cfg)
        state = state.replace(step=jnp.asarray(step_counter, jnp.int32))
        step = jax.jit(build_train_step(gan, L.WassersteinGanLoss(),
                                        optG, optD, cfg))
        s1, m1 = step(state, batch, jax.random.key(1))
        return jax.device_get(s1), jax.device_get(m1)

    def _assert_same(self, a, b):
        (sa, ma), (sb, mb) = a, b
        np.testing.assert_allclose(mb["loss_d"], ma["loss_d"], rtol=1e-5)
        for (pa, la), (_, lb) in zip(
                jax.tree_util.tree_leaves_with_path(sa.d_vars[0]["params"]),
                jax.tree_util.tree_leaves_with_path(sb.d_vars[0]["params"])):
            # atol 5e-6: a lax.cond branch and the straight-line program fuse
            # differently; observed f32 noise is ~1e-6 on isolated elements
            np.testing.assert_allclose(
                np.asarray(lb), np.asarray(la), atol=5e-6, rtol=1e-5,
                err_msg=f"d{jax.tree_util.keystr(pa)}")

    def test_on_step_matches_every_step_at_scaled_lambda(self):
        gan, optG, optD, batch = self._setup()
        ref = self._one_step(gan, optG, optD, batch, 0, gp_lambda=10.0, gp_every=1)
        lazy = self._one_step(gan, optG, optD, batch, 0, gp_lambda=5.0, gp_every=2)
        self._assert_same(ref, lazy)

    def test_off_step_matches_no_gp(self):
        gan, optG, optD, batch = self._setup()
        ref = self._one_step(gan, optG, optD, batch, 1, gp_lambda=-1.0, gp_every=1)
        lazy = self._one_step(gan, optG, optD, batch, 1, gp_lambda=5.0, gp_every=2)
        self._assert_same(ref, lazy)

    def test_on_off_actually_differ(self):
        gan, optG, optD, batch = self._setup()
        on = self._one_step(gan, optG, optD, batch, 0, gp_lambda=5.0, gp_every=2)
        off = self._one_step(gan, optG, optD, batch, 1, gp_lambda=5.0, gp_every=2)
        assert abs(on[1]["loss_d"] - off[1]["loss_d"]) > 1e-6
