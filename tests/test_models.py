"""Shape/dtype tests for the model library, mirroring the reference `__main__` smoke
blocks (SURVEY.md §4: resnet3d.py:59-81, tganv2/gen.py:122-145, tgan/gen.py:80-94,
tcwyt/*, layers.py:261-309), at CPU-friendly sizes."""

import jax
import jax.numpy as jnp
import numpy as np

from txt2vid_tpu.models.layers import (
    Attention, Attention3d, UpBlock, DownBlock, RenderBlock)
from txt2vid_tpu.models.conv_lstm import ConvLSTM
from txt2vid_tpu.models.resnet3d import Resnet3D
from txt2vid_tpu.models import tganv2, tganv2_cond, tgan, tcwyt, img
from txt2vid_tpu.models.txt import Seq2Seq


def init_and_apply(model, *args, rngs=None, method=None, **kwargs):
    rngs = rngs or {}
    variables = model.init({"params": jax.random.key(0), **rngs}, *args,
                           method=method, **kwargs)
    out = model.apply(variables, *args, rngs=rngs, method=method,
                      mutable=["batch_stats"], **kwargs)
    return out[0], variables


class TestLayers:
    def test_attention_2d(self):
        x = jnp.ones((2, 8, 8, 32))
        out, variables = init_and_apply(Attention(32, use_pallas=False), x)
        assert out.shape == x.shape
        # gamma init 0 => output == input at init (reference layers.py:21,36)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_attention_3d(self):
        x = jnp.ones((2, 4, 8, 8, 32))
        out, _ = init_and_apply(Attention3d(32, use_pallas=False), x)
        assert out.shape == x.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_upblock(self):
        x = jnp.ones((2, 4, 4, 16))
        out, _ = init_and_apply(UpBlock(16, 8), x, train=True)
        assert out.shape == (2, 8, 8, 8)

    def test_upblock_non_local(self):
        x = jnp.ones((2, 4, 4, 16))
        out, _ = init_and_apply(UpBlock(16, 16, with_non_local=True, use_pallas=False),
                                x, train=True)
        assert out.shape == (2, 8, 8, 16)

    def test_downblock(self):
        # reference layers.py __main__: (10, 3, 16, 100, 100) -> DownBlock(3, 128)
        x = jnp.ones((2, 8, 10, 10, 3))
        out, _ = init_and_apply(DownBlock(3, 32), x)
        assert out.shape == (2, 4, 5, 5, 32)

    def test_renderblock(self):
        x = jnp.ones((2, 8, 8, 16))
        out, _ = init_and_apply(RenderBlock(16, 3), x, train=True)
        assert out.shape == (2, 8, 8, 3)
        assert float(jnp.abs(out).max()) <= 1.0


class TestConvLSTM:
    def test_unroll_shape(self):
        x = jnp.ones((2, 2, 2, 8))
        model = ConvLSTM(hidden_channels=(16,), step=4)
        out, _ = init_and_apply(model, x)
        assert out.shape == (2, 4, 2, 2, 16)

    def test_steps_differ(self):
        x = jax.random.normal(jax.random.key(1), (1, 2, 2, 8))
        model = ConvLSTM(hidden_channels=(16,), step=4)
        out, _ = init_and_apply(model, x)
        # hidden state evolves: consecutive steps should not be identical
        assert not np.allclose(np.asarray(out[:, 0]), np.asarray(out[:, 1]))

    def test_multi_layer(self):
        x = jnp.ones((2, 2, 2, 8))
        model = ConvLSTM(hidden_channels=(16, 8), step=3)
        out, _ = init_and_apply(model, x)
        assert out.shape == (2, 3, 2, 2, 8)

    def test_gradients_flow(self):
        model = ConvLSTM(hidden_channels=(8,), step=3)
        x = jnp.ones((1, 2, 2, 4))
        variables = model.init(jax.random.key(0), x)

        def loss(params):
            return jnp.sum(model.apply({"params": params}, x) ** 2)

        grads = jax.grad(loss)(variables["params"])
        total = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
        assert np.isfinite(total) and total > 0


class TestResnet3D:
    def test_uncond(self):
        x = jnp.ones((2, 8, 16, 16, 3))
        model = Resnet3D(num_channels=3, num_down_blocks=2, use_pallas=False)
        (uncond, cond, feats), _ = init_and_apply(model, x)
        assert uncond.shape == (2, 1)
        assert cond is None
        assert feats.shape == (2, 256)  # 128 * 2^(blocks-1)

    def test_cond_heads(self):
        x = jnp.ones((2, 8, 16, 16, 3))
        c = jnp.ones((2, 10))
        model = Resnet3D(num_channels=3, cond_dim=10, num_down_blocks=2, use_pallas=False)
        (uncond, cond, feats), variables = init_and_apply(model, x, cond=c)
        assert uncond.shape == (2, 1) and cond.shape == (2, 1)

        # computed_features skips the backbone (reference resnet3d.py:40-41, with the
        # uncond head skipped too)
        out2 = model.apply(variables, x=None, cond=c, computed_features=feats,
                           mutable=["batch_stats"])[0]
        assert out2[0] is None
        np.testing.assert_allclose(np.asarray(out2[1]), np.asarray(cond), atol=1e-6)


class TestTGANv2:
    def test_gen_train_pyramid(self):
        model = tganv2.MultiScaleGen(latent_size=32, width=64, height=64,
                                     num_channels=3, fm_channels=64,
                                     additional_blocks=(16, 8, 8), num_frames=8,
                                     use_pallas=False)
        z = jnp.ones((8, 32))
        rendered, _ = init_and_apply(model, z, train=True,
                                     rngs={"sample": jax.random.key(1)})
        # scales: (B, T) halve per level; sizes 8,16,32,64
        assert [r.shape for r in rendered] == [
            (8, 8, 8, 8, 3), (4, 4, 16, 16, 3), (2, 2, 32, 32, 3), (1, 1, 64, 64, 3)]

    def test_gen_eval_final_only(self):
        model = tganv2.MultiScaleGen(latent_size=32, width=64, height=64,
                                     fm_channels=64, additional_blocks=(16, 8, 8),
                                     num_frames=8, use_pallas=False)
        z = jnp.ones((2, 32))
        variables = model.init({"params": jax.random.key(0),
                                "sample": jax.random.key(1)}, z, train=True)
        out = model.apply(variables, z, train=False, mutable=["batch_stats"])[0]
        assert len(out) == 1 and out[0].shape == (2, 8, 64, 64, 3)

    def test_gen_fm_stride_shallow_pyramid(self):
        # fm_stride overrides the reference's hardcoded width//64 latent-plane
        # downscale so shallower pyramids honor `width`: 2 additional blocks +
        # fm_stride=32 -> base at width/4, scales width/4, width/2, width (the
        # 3-scale 128px recipe, RESULTS.md round 3). Default (None) keeps
        # reference semantics — covered by the pyramid tests above and the
        # reference-parity suite.
        model = tganv2.MultiScaleGen(latent_size=32, width=64, height=64,
                                     num_channels=1, fm_channels=32,
                                     additional_blocks=(16, 8), fm_stride=32,
                                     num_frames=8, use_pallas=False)
        z = jnp.ones((4, 32))
        rendered, _ = init_and_apply(model, z, train=True,
                                     rngs={"sample": jax.random.key(1)})
        assert [r.shape for r in rendered] == [
            (4, 8, 16, 16, 1), (2, 4, 32, 32, 1), (1, 2, 64, 64, 1)]

    def test_gen_no_lstm_respects_num_frames(self):
        # r2 hardcoded 16 frames on this path (VERDICT weak #4); FrameSeedGenerator
        # emits 16 seeds which are sliced to num_frames
        model = tganv2.MultiScaleGen(latent_size=16, width=64, height=64,
                                     num_channels=1, fm_channels=16,
                                     additional_blocks=(8,), num_frames=8,
                                     no_lstm=True, use_pallas=False)
        z = jnp.ones((4, 16))
        rendered, _ = init_and_apply(model, z, train=True,
                                     rngs={"sample": jax.random.key(1)})
        assert [r.shape for r in rendered] == [
            (4, 8, 8, 8, 1), (2, 4, 16, 16, 1)]

    def test_discrim_multi_scale(self):
        model = tganv2.MultiScaleDiscrim(discrim_down_blocks=(2, 2, 2, 2),
                                         use_pallas=False)
        xs = [jnp.ones((8, 8, 8, 8, 3)), jnp.ones((4, 4, 16, 16, 3)),
              jnp.ones((2, 2, 32, 32, 3)), jnp.ones((1, 1, 64, 64, 3))]
        out, _ = init_and_apply(model, xs)
        assert len(out) == 4
        for (u, c, f), x in zip(out, xs):
            assert u.shape == (x.shape[0], 1) and c is None

    def test_discrim_cond(self):
        model = tganv2.MultiScaleDiscrim(discrim_down_blocks=(2, 2), cond_dim=16,
                                         use_pallas=False)
        xs = [jnp.ones((4, 8, 8, 8, 3)), jnp.ones((2, 4, 16, 16, 3))]
        conds = [jnp.ones((4, 16)), jnp.ones((2, 16))]
        out, _ = init_and_apply(model, xs, cond=conds)
        for (u, c, f), x in zip(out, xs):
            assert u.shape == (x.shape[0], 1) and c.shape == (x.shape[0], 1)


class TestTGAN:
    def test_gen(self):
        model = tgan.Gen(z_slow_dim=16, z_fast_dim=16, cond_dim=8, conv_ch=64)
        z = jnp.ones((2, 16))
        c = jnp.ones((2, 8))
        out, _ = init_and_apply(model, z, cond=c, train=True)
        assert out.shape == (2, 16, 64, 64, 3)

    def test_frame_seed_generator(self):
        model = tgan.FrameSeedGenerator(z_fast_dim=32)
        z = jnp.ones((3, 16))
        out, _ = init_and_apply(model, z, train=True)
        assert out.shape == (3, 16, 32)
        assert float(jnp.abs(out).max()) <= 1.0


class TestTCWYT:
    def test_gen(self):
        model = tcwyt.Gen(z_size=16, cond_dim=8)
        out, _ = init_and_apply(model, jnp.ones((2, 16)), cond=jnp.ones((2, 8)),
                                train=True)
        assert out.shape == (2, 16, 48, 48, 3)

    def test_video_discrim(self):
        model = tcwyt.VideoDiscrim(cond_dim=8, mid_ch=16)
        x = jnp.ones((2, 16, 48, 48, 3))
        out, _ = init_and_apply(model, x=x, cond=jnp.ones((2, 8)), train=True)
        assert out.shape == (2,)

    def test_video_discrim_uncond(self):
        model = tcwyt.VideoDiscrim(cond_dim=0, mid_ch=16)
        x = jnp.ones((2, 16, 64, 64, 3))
        out, _ = init_and_apply(model, x=x, train=True)
        assert out.shape == (2,)

    def test_frame_map_and_discrims(self):
        fm = tcwyt.FrameMap()
        vids = jnp.ones((2, 4, 48, 48, 3))
        xbar, _ = init_and_apply(fm, vids, train=True)
        assert xbar.shape == (2, 4, 3, 3, 512)

        fd = tcwyt.FrameDiscrim(cond_dim=8)
        out, _ = init_and_apply(fd, cond=jnp.ones((2, 8)), xbar=xbar, train=True)
        assert out.shape == (2, 4)

        md = tcwyt.MotionDiscrim(cond_dim=8)
        out, _ = init_and_apply(md, cond=jnp.ones((2, 8)), xbar=xbar, train=True)
        assert out.shape == (2, 3)


class TestImg:
    def test_gen_discrim(self):
        g = img.Gen(dim=16)
        z = jnp.ones((2, 128))
        out, _ = init_and_apply(g, z, train=True)
        assert out.shape == (2, 64, 64, 3)

        d = img.Discrim(dim=16)
        logits, _ = init_and_apply(d, x=out, train=True)
        assert logits.shape == (2,)


class TestTxt:
    def test_encode_shapes(self):
        model = Seq2Seq(vocab_size=50)
        x = jnp.array([[1, 4, 5, 6, 2, 0, 0], [1, 7, 8, 2, 0, 0, 0]], dtype=jnp.int32)
        lengths = jnp.array([5, 4])
        (out, states, hn), _ = init_and_apply(model, x, lengths=lengths)
        assert out.shape == (2, 7, 256)
        assert hn.shape == (2, 256)

    def test_encoding_respects_lengths(self):
        model = Seq2Seq(vocab_size=50)
        x = jnp.array([[1, 4, 5, 2, 0, 0]], dtype=jnp.int32)
        variables = model.init(jax.random.key(0), x, lengths=jnp.array([4]))
        _, _, hn1 = model.apply(variables, x, lengths=jnp.array([4]))
        # changing tokens beyond the length must not change the encoding
        x2 = x.at[0, 4].set(9)
        _, _, hn2 = model.apply(variables, x2, lengths=jnp.array([4]))
        np.testing.assert_allclose(np.asarray(hn1), np.asarray(hn2), atol=1e-6)

    def test_decode(self):
        model = Seq2Seq(vocab_size=50)
        x = jnp.array([[1, 4, 5, 2], [1, 7, 8, 2]], dtype=jnp.int32)
        lengths = jnp.array([4, 4])
        variables = model.init(jax.random.key(0), x, lengths=lengths)
        _, states, _ = model.apply(variables, x, lengths=lengths)
        raw, syms = model.apply(variables, x, initial_hidden=states, max_seq_len=5,
                                teacher_force=True, method=Seq2Seq.decode)
        assert raw.shape == (2, 5, 50)
        assert syms.shape == (2, 5)

    def test_decode_scan_matches_python_unroll(self):
        """The lax.scan decode must be numerically identical to a hand unroll of
        _step (the reference's per-token Python loop, basic.py:85-97)."""
        model = Seq2Seq(vocab_size=30, embed_size=8, hidden_size=16, num_layers=2)
        x = jnp.array([[1, 4, 5, 2], [1, 7, 8, 2]], dtype=jnp.int32)
        lengths = jnp.array([4, 4])
        variables = model.init(jax.random.key(0), x, lengths=lengths)
        _, enc_states, _ = model.apply(variables, x, lengths=lengths,
                                       method=Seq2Seq.encode)

        for teacher_force in (False, True):
            raw, syms = model.apply(variables, x, initial_hidden=enc_states,
                                    max_seq_len=6, teacher_force=teacher_force,
                                    method=Seq2Seq.decode)

            # manual unroll via the bound module's _step
            bound = model.bind(variables)
            dec = bound.decoder
            states = enc_states
            tok = x[:, 0]
            raws, preds = [], []
            for i in range(6):
                logits, states = dec._step(tok, states)
                pred = jnp.argmax(logits, axis=-1).astype(tok.dtype)
                raws.append(logits)
                preds.append(pred)
                tok = x[:, min(i, x.shape[1] - 1)] if teacher_force else pred
            ref_raw = jnp.stack(raws, axis=1)
            ref_syms = jnp.stack(preds, axis=1)

            np.testing.assert_allclose(np.asarray(raw), np.asarray(ref_raw),
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_array_equal(np.asarray(syms), np.asarray(ref_syms))


class TestRemat:
    def test_remat_gen_matches_and_grads(self):
        kwargs = dict(latent_size=16, width=16, height=16, num_channels=1,
                      fm_channels=16, additional_blocks=(8,), num_frames=4,
                      use_pallas=False)
        gen = tganv2.MultiScaleGen(**kwargs)
        gen_r = tganv2.MultiScaleGen(remat=True, **kwargs)
        z = jax.random.normal(jax.random.key(0), (4, 16))
        rngs = {"params": jax.random.key(1), "sample": jax.random.key(2)}
        v = gen.init(rngs, z, train=True)
        out = gen.apply(v, z, train=True, rngs={"sample": jax.random.key(2)},
                        mutable=["batch_stats"])[0]
        out_r = gen_r.apply(v, z, train=True, rngs={"sample": jax.random.key(2)},
                            mutable=["batch_stats"])[0]
        for a, b in zip(out, out_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

        def loss(params, model):
            o = model.apply({"params": params, "batch_stats": v["batch_stats"]},
                            z, train=True, rngs={"sample": jax.random.key(2)},
                            mutable=["batch_stats"])[0]
            return sum(jnp.sum(x ** 2) for x in o)

        g1 = jax.grad(lambda p: loss(p, gen))(v["params"])
        g2 = jax.grad(lambda p: loss(p, gen_r))(v["params"])
        for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
