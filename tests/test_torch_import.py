"""Reference-checkpoint importer (txt2vid_tpu/compat/torch_import.py): write a
checkpoint EXACTLY as the reference trainer does (gan/trainer.py:269-279 — flat
torch.save dict with optG/optD/gen/cond/discrim-0 entries), import it through the
CLI, restore the emitted GanTrainState, and assert the imported flax modules agree
numerically with the reference modules' forward passes (f32, scale-relative tol)."""

import argparse
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))

import jax
import jax.numpy as jnp


VOCAB = 13
LATENT = 8
FRAME_SIZES = (8, 16, 32)
NUM_FRAMES = 4


def _assert_close(j, t, tol, what):
    j = np.asarray(j, np.float64)
    t = t.detach().cpu().numpy().astype(np.float64) if isinstance(t, torch.Tensor) \
        else np.asarray(t, np.float64)
    assert j.shape == t.shape, f"{what}: {j.shape} vs {t.shape}"
    scale = max(1.0, float(np.abs(t).max()))
    err = float(np.abs(j - t).max())
    assert err <= tol * scale, f"{what}: max err {err} (scale {scale})"


@pytest.fixture(autouse=True)
def _no_data_parallel(monkeypatch):
    import torch.nn.parallel as tnp
    monkeypatch.setattr(tnp, "data_parallel",
                        lambda module, inputs, *a, **k: module(inputs))


def _build_reference_gan(seed=31):
    from txt2vid.models.tganv2_cond.discrim import MultiScaleDiscrim as RefD
    from txt2vid.models.tganv2_cond.gen import MultiScaleGen as RefG
    from txt2vid.models.txt.basic import Seq2Seq as RefS

    torch.manual_seed(seed)
    enc = RefS(vocab_size=VOCAB)
    gen = RefG(latent_size=LATENT, width=64, height=64, num_channels=1,
               additional_blocks=[8, 8], fm_channels=1024, num_frames=NUM_FRAMES,
               cond_dim=enc.encoder.encoding_size)
    dis = RefD(discrim_down_blocks=[1, 1, 1], num_channels=1,
               cond_dim=enc.encoder.encoding_size)
    # make the import of the non-default leaves observable: nonzero attention
    # gains and non-trivial BN running statistics
    g = torch.Generator().manual_seed(seed + 1)
    gen.abstract_blocks[1].attn.gamma.data = torch.tensor(0.6)
    dis.single_discrim.module.down[1].gamma.data = torch.tensor(-0.3)
    for mod in list(gen.modules()) + list(dis.modules()):
        if isinstance(mod, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d,
                            torch.nn.BatchNorm3d)):
            mod.running_mean.normal_(generator=g)
            mod.running_var.uniform_(0.5, 1.5, generator=g)
    return gen, dis, enc


def _save_reference_checkpoint(path, gen, dis, enc):
    # exactly the reference trainer's save shape (trainer.py:269-279 +
    # cond_gan.py save_dict, default discrim names cond_gan.py:13-14)
    opt = torch.optim.Adam(gen.parameters())
    torch.save({"optG": opt.state_dict(), "optD": opt.state_dict(),
                "gen": gen.state_dict(), "cond": enc.state_dict(),
                "discrim-0": dis.state_dict()}, path)


def _import(tmp_path):
    from txt2vid_tpu.compat.torch_import import main

    gen, dis, enc = _build_reference_gan()
    ckpt = str(tmp_path / "ref_iter_100_lossG_0.7_lossD_0.7")
    _save_reference_checkpoint(ckpt, gen, dis, enc)

    gspec = ('{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen", "args": '
             '{"latent_size": %d, "width": 64, "height": 64, "num_channels": 1, '
             '"additional_blocks": [8, 8], "num_frames": %d, "use_pallas": false}}'
             % (LATENT, NUM_FRAMES))
    dspec = ('{"class": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim", "args": '
             '{"discrim_down_blocks": [1, 1, 1], "num_channels": 1, '
             '"use_pallas": false}}')
    out = str(tmp_path / "imported")
    main(argparse.Namespace(
        ckpt=ckpt, out=out, G=gspec, D=[dspec], discrim_names=None, M=None,
        sent="txt2vid_tpu.models.txt.Seq2Seq", vocab=None, vocab_size=VOCAB,
        frame_sizes=list(FRAME_SIZES), num_frames=NUM_FRAMES, num_channels=1))
    return gen, dis, enc, gspec, dspec, out


def _restore(gspec, dspec, path):
    import optax

    from txt2vid_tpu.config import create_object
    from txt2vid_tpu.gan.cond_gan import CondGan
    from txt2vid_tpu.gan.train_step import TrainConfig, init_state_abstract
    from txt2vid_tpu.models.txt import Seq2Seq
    from txt2vid_tpu.utils.checkpoint import restore_state

    txt = Seq2Seq(vocab_size=VOCAB)
    gen = create_object(gspec, cond_dim=txt.encoding_size)
    dis = create_object(dspec, cond_dim=txt.encoding_size)
    gan = CondGan(gen=gen, discrims=[dis], cond_encoder=txt)
    config = TrainConfig(frame_sizes=FRAME_SIZES, latent_size=LATENT)
    batch = {"video": jnp.zeros((2, NUM_FRAMES, FRAME_SIZES[-1], FRAME_SIZES[-1], 1),
                                jnp.float32),
             "captions": jnp.ones((2, 8), jnp.int32),
             "lengths": jnp.full((2,), 8, jnp.int32)}
    opt = optax.adam(1e-4)
    state = init_state_abstract(gan, jax.random.key(0), batch, opt, opt, config)
    return gan, restore_state(state, path)


class TestTorchImport:
    def test_imported_checkpoint_matches_reference_forward(self, tmp_path):
        ref_gen, ref_dis, ref_enc, gspec, dspec, out = _import(tmp_path)
        gan, state = _restore(gspec, dspec, out)
        rng = np.random.default_rng(32)

        # --- encoder: sentence encodings agree -----------------------------
        toks = rng.integers(0, VOCAB, (4, 6)).astype(np.int64)
        lengths = [6, 4, 3, 3]
        with torch.no_grad():
            _, _, hn_ref = ref_enc.encode(torch.tensor(toks), lengths=lengths)
        hn = gan.encode(state.txt_vars, jnp.asarray(toks.astype(np.int32)),
                        jnp.asarray(np.asarray(lengths, np.int32)))
        _assert_close(hn, hn_ref, 2e-4, "imported encoder hn")

        # --- generator: eval-mode render agrees (same cond both sides) -----
        z = rng.standard_normal((2, LATENT)).astype(np.float32)
        cond = np.asarray(hn_ref[:2].detach(), np.float32)
        ref_gen.eval()
        with torch.no_grad():
            r_ref = ref_gen(torch.tensor(z), cond=torch.tensor(cond))
        assert len(r_ref) == 1
        r = gan.gen.apply(state.g_vars, jnp.asarray(z), cond=jnp.asarray(cond),
                          train=False)
        assert len(r) == 1
        _assert_close(np.asarray(r[0]).transpose(0, 4, 1, 2, 3), r_ref[0],
                      3e-3, "imported generator render")

        # --- discriminator: uncond + cond logits agree per scale -----------
        xs = [rng.standard_normal((2, 1, NUM_FRAMES, s, s)).astype(np.float32)
              for s in FRAME_SIZES]
        conds = [np.asarray(hn_ref[:2].detach(), np.float32)] * len(FRAME_SIZES)
        ref_dis.eval()
        with torch.no_grad():
            out_ref = ref_dis(x=[torch.tensor(x) for x in xs],
                              cond=[torch.tensor(c) for c in conds])
        ours = gan.discrims[0].apply(
            state.d_vars[0],
            [jnp.asarray(x.transpose(0, 2, 3, 4, 1)) for x in xs],
            [jnp.asarray(c) for c in conds])
        for i, ((u, c, f), (u_ref, c_ref, f_ref)) in enumerate(zip(ours, out_ref)):
            _assert_close(u, u_ref, 2e-3, f"imported discrim uncond scale {i}")
            _assert_close(c, c_ref, 2e-3, f"imported discrim cond scale {i}")

        # fresh optimizer state and step 0, as documented
        assert int(state.step) == 0

    def test_wrong_family_fails_loudly(self, tmp_path):
        from txt2vid_tpu.compat.torch_import import MissingKey, multiscale_gen_vars
        _, dis, _ = _build_reference_gan()
        with pytest.raises((MissingKey, KeyError)):
            multiscale_gen_vars(
                {k: v.numpy() for k, v in dis.state_dict().items()})


def _randomize_bn(*mods, seed=1):
    g = torch.Generator().manual_seed(seed)
    for mod in mods:
        for m in mod.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d,
                              torch.nn.BatchNorm3d)):
                m.running_mean.normal_(generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)


def _sd(mod):
    return {k: v.numpy() for k, v in mod.state_dict().items()}


class TestTCWYTImport:
    def test_full_tcwyt_checkpoint_with_sample_mapping(self, tmp_path):
        """The reference run.sh family: TCWYT gen + video/frame/motion discrims +
        FrameMap (--M) + encoder, through the import CLI."""
        from txt2vid.models.tcwyt.frame_discrim import (FrameDiscrim as RefF,
                                                        FrameMap as RefM)
        from txt2vid.models.tcwyt.gen import Gen as RefG
        from txt2vid.models.tcwyt.motion_discrim import MotionDiscrim as RefMo
        from txt2vid.models.tcwyt.video_discrim import VideoDiscrim as RefV
        from txt2vid.models.txt.basic import Seq2Seq as RefS

        from txt2vid_tpu.compat.torch_import import main

        torch.manual_seed(41)
        enc = RefS(vocab_size=VOCAB)
        cd = enc.encoder.encoding_size
        gen = RefG(z_size=10, cond_dim=cd, num_channels=3, scale_factor=0.125)
        dv = RefV(cond_dim=cd, mid_ch=64)
        df = RefF(cond_dim=cd)
        dm = RefMo(cond_dim=cd)
        fmap = RefM()
        _randomize_bn(gen, dv, df, dm, fmap, seed=42)

        ckpt = str(tmp_path / "ref_tcwyt")
        opt = torch.optim.Adam(gen.parameters())
        torch.save({"optG": opt.state_dict(), "optD": opt.state_dict(),
                    "gen": gen.state_dict(), "cond": enc.state_dict(),
                    "sample_mapping": fmap.state_dict(),
                    "discrim-0": dv.state_dict(), "discrim-1": df.state_dict(),
                    "discrim-2": dm.state_dict()}, ckpt)

        gspec = ('{"class": "txt2vid_tpu.models.tcwyt.Gen", "args": '
                 '{"z_size": 10, "num_channels": 3, "scale_factor": 0.125}}')
        dspecs = [
            '{"class": "txt2vid_tpu.models.tcwyt.VideoDiscrim", "args": {"mid_ch": 64}}',
            'txt2vid_tpu.models.tcwyt.FrameDiscrim',
            'txt2vid_tpu.models.tcwyt.MotionDiscrim',
        ]
        out = str(tmp_path / "imported_tcwyt")
        main(argparse.Namespace(
            ckpt=ckpt, out=out, G=gspec, D=dspecs, discrim_names=None,
            M="txt2vid_tpu.models.tcwyt.FrameMap",
            sent="txt2vid_tpu.models.txt.Seq2Seq", vocab=None, vocab_size=VOCAB,
            frame_sizes=[48], num_frames=16, num_channels=3))

        # restore and compare forwards
        import optax

        from txt2vid_tpu.config import create_object
        from txt2vid_tpu.gan.cond_gan import CondGan
        from txt2vid_tpu.gan.train_step import TrainConfig, init_state_abstract
        from txt2vid_tpu.models.txt import Seq2Seq
        from txt2vid_tpu.utils.checkpoint import restore_state

        txt = Seq2Seq(vocab_size=VOCAB)
        jgen = create_object(gspec, cond_dim=txt.encoding_size)
        jds = [create_object(d, cond_dim=txt.encoding_size) for d in dspecs]
        jmap = create_object("txt2vid_tpu.models.tcwyt.FrameMap")
        gan = CondGan(gen=jgen, discrims=jds, cond_encoder=txt,
                      sample_mapping=jmap)
        batch = {"video": jnp.zeros((2, 16, 48, 48, 3), jnp.float32),
                 "captions": jnp.ones((2, 8), jnp.int32),
                 "lengths": jnp.full((2,), 8, jnp.int32)}
        opt2 = optax.adam(1e-4)
        state = init_state_abstract(gan, jax.random.key(0), batch, opt2, opt2,
                                    TrainConfig(frame_sizes=(48,), latent_size=10))
        state = restore_state(state, out)

        rng = np.random.default_rng(43)
        z = rng.standard_normal((2, 10)).astype(np.float32)
        cond = rng.standard_normal((2, cd)).astype(np.float32)
        gen.eval()
        with torch.no_grad():
            v_ref = gen(torch.tensor(z), cond=torch.tensor(cond))
        v = jgen.apply(state.g_vars, jnp.asarray(z), cond=jnp.asarray(cond),
                       train=False)
        _assert_close(np.asarray(v).transpose(0, 4, 1, 2, 3), v_ref, 3e-3,
                      "imported tcwyt gen")

        vids = rng.standard_normal((2, 3, 16, 48, 48)).astype(np.float32)
        vids_j = jnp.asarray(vids.transpose(0, 2, 3, 4, 1))
        dv.eval(), fmap.eval(), df.eval(), dm.eval()
        with torch.no_grad():
            yv_ref = dv(x=torch.tensor(vids), cond=torch.tensor(cond))
            xb_ref = fmap(torch.tensor(vids))
            yf_ref = df(cond=torch.tensor(cond), xbar=xb_ref)
            ym_ref = dm(cond=torch.tensor(cond), xbar=xb_ref)
        yv = jds[0].apply(state.d_vars[0], vids_j, jnp.asarray(cond), train=False)
        _assert_close(jnp.mean(yv), yv_ref, 2e-3, "imported video discrim")
        xb = jmap.apply(state.m_vars, vids_j, train=False)
        _assert_close(np.asarray(xb).transpose(1, 0, 4, 2, 3), xb_ref, 3e-3,
                      "imported frame map")
        yf = jds[1].apply(state.d_vars[1], cond=jnp.asarray(cond), xbar=xb,
                          train=False)
        _assert_close(np.asarray(yf).T, yf_ref, 3e-3, "imported frame discrim")
        ym = jds[2].apply(state.d_vars[2], cond=jnp.asarray(cond), xbar=xb,
                          train=False)
        _assert_close(np.asarray(ym).T, ym_ref, 3e-3, "imported motion discrim")


class TestConverterLevel:
    def test_tgan_gen(self):
        from txt2vid.models.tgan.gen import Gen as Ref
        from txt2vid_tpu.compat.torch_import import tgan_gen_vars
        from txt2vid_tpu.models.tgan import Gen

        torch.manual_seed(51)
        ref = Ref(z_slow_dim=8, z_fast_dim=8, cond_dim=4, out_channels=3,
                  bottom_width=4, conv_ch=32)
        _randomize_bn(ref, seed=52)
        rng = np.random.default_rng(53)
        z = rng.standard_normal((2, 8)).astype(np.float32)
        cond = rng.standard_normal((2, 4)).astype(np.float32)
        ref.eval()
        with torch.no_grad():
            y_ref = ref(torch.tensor(z), cond=torch.tensor(cond))
        m = Gen(z_slow_dim=8, z_fast_dim=8, cond_dim=4, out_channels=3,
                bottom_width=4, conv_ch=32)
        y = m.apply(tgan_gen_vars(_sd(ref)), jnp.asarray(z), jnp.asarray(cond),
                    train=False)
        _assert_close(np.asarray(y).transpose(0, 4, 1, 2, 3), y_ref, 3e-3,
                      "imported tgan gen")

    def test_multiscale_gen_no_lstm(self):
        """no_lstm (FrameSeedGenerator temporal core, reference tganv2/gen.py:40-43)
        checkpoints convert through multiscale_gen_vars. Forward parity is asserted
        against the reference with its seed-output view corrected to the intended
        permute: the reference reinterprets the (B, fm_size, 16) deconv output with
        a raw `.view(B, 16, -1, h, w)` (gen.py:73-74), which mixes the time axis
        into channels — its "16 frame seeds" are not per-frame. Documented
        reference bug (converter docstring); ours implements seed t == frame t."""
        import torch.nn.parallel as tnp

        from txt2vid.models.tganv2.gen import MultiScaleGen as Ref
        from txt2vid_tpu.compat.torch_import import multiscale_gen_vars
        from txt2vid_tpu.models.tganv2 import MultiScaleGen

        orig_dp = tnp.data_parallel
        tnp.data_parallel = lambda module, inputs, *a, **k: module(inputs)
        try:
            torch.manual_seed(57)
            ref = Ref(latent_size=LATENT, width=64, height=64, num_channels=1,
                      additional_blocks=[8], fm_channels=1024, num_frames=16,
                      no_lstm=True)
            _randomize_bn(ref, seed=58)
            sd = _sd(ref)  # grab weights BEFORE patching the seed stack
            ref.eval()

            # intended-semantics reference: raw-memory order (c, t) -> (t, c), so
            # the forward's subsequent raw view splits frames, not a scramble
            fsgen = ref._modules.pop("frame_seed_gen")
            ref.frame_seed_gen = \
                lambda x: fsgen(x).permute(0, 2, 1).contiguous()

            rng = np.random.default_rng(59)
            z = rng.standard_normal((2, LATENT)).astype(np.float32)
            with torch.no_grad():
                y_ref = ref(torch.tensor(z))
            assert len(y_ref) == 1  # eval mode: final scale only

            m = MultiScaleGen(latent_size=LATENT, width=64, height=64,
                              num_channels=1, additional_blocks=(8,),
                              fm_channels=1024, num_frames=16, no_lstm=True,
                              use_pallas=False)
            var = multiscale_gen_vars(sd)
            assert "frame_seed_gen" in var["params"] \
                and "clstm" not in var["params"]
            y = m.apply(var, jnp.asarray(z), train=False)
            _assert_close(np.asarray(y[0]).transpose(0, 4, 1, 2, 3), y_ref[0],
                          3e-3, "imported no_lstm multiscale gen")
        finally:
            tnp.data_parallel = orig_dp

    def test_img_pair(self):
        from txt2vid.models.img.models import Discrim as RefD
        from txt2vid.models.img.models import Gen as RefG
        from txt2vid_tpu.compat.torch_import import img_discrim_vars, img_gen_vars
        from txt2vid_tpu.models.img import Discrim, Gen

        torch.manual_seed(54)
        ref_g, ref_d = RefG(), RefD()
        _randomize_bn(ref_g, seed=55)
        rng = np.random.default_rng(56)
        z = rng.standard_normal((2, 128)).astype(np.float32)
        x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
        ref_g.eval(), ref_d.eval()
        ref_g.dim = 64
        with torch.no_grad():
            yg_ref = ref_g(torch.tensor(z))
            yd_ref = ref_d(x=torch.tensor(x))
        yg = Gen().apply(img_gen_vars(_sd(ref_g)), jnp.asarray(z), train=False)
        _assert_close(np.asarray(yg).transpose(0, 3, 1, 2), yg_ref, 3e-3,
                      "imported img gen")
        yd = Discrim().apply(img_discrim_vars(_sd(ref_d)),
                             jnp.asarray(x.transpose(0, 2, 3, 1)))
        _assert_close(yd, yd_ref, 3e-3, "imported img discrim")
