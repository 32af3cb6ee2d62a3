"""Numerical golden-parity tests against the ACTUAL reference implementation.

The reference (/root/reference, PyTorch) is installed-importable with torch alone.
Each test instantiates the reference torch module, transplants its weights into the
flax module, runs both on identical inputs, and asserts numerical agreement — in
float64 (jax.experimental.enable_x64) so a transposed kernel, wrong pooling pad, or
flipped gate order shows up as an O(1) error, not noise.

Documented deviations are asserted PRECISELY:
  * VanillaGanLoss label swap (reference losses.py:26-27): reference(fake, real) ==
    ours(real, fake), and reference gen == ours on negated logits.
  * HingeGanLoss: the reference's swapped-label HingeEmbeddingLoss math is exactly
    our mean(relu(m - real)) + mean(fake) form — direct equality.
  * RaSGANLoss: the reference raises AttributeError (losses.py:95 `self.fake_labels`
    typo); ours matches the intended formula computed by hand in torch.
  * TCWYT VideoDiscrim: reference returns the BATCH-MEAN scalar logit
    (video_discrim.py:55-57); ours returns per-sample logits whose mean equals it.
  * Frame/Motion discrims: reference xbar layout is (T, B, C, H, W) and output (T, B);
    ours is (B, T, ...) / (B, T) — equal after transpose.
  * ConvLSTM: reference peephole weights are untrained zeros (conv_lstm.py:46-49);
    ours omits them — outputs must still agree exactly.
"""

import sys
import types

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")
sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))

import jax
import jax.numpy as jnp

from txt2vid_tpu.gan import losses as jlosses


# ---------------------------------------------------------------------------
# weight-transplant helpers (torch -> flax layouts)
# ---------------------------------------------------------------------------

def t2n(t):
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float64)


def conv_w(m):
    """torch Conv{1,2,3}d weight (O, I, *k) -> flax (*k, I, O)."""
    w = t2n(m.weight)
    return np.transpose(w, tuple(range(2, w.ndim)) + (1, 0))


def convT_w(m):
    """torch ConvTranspose{1,2,3}d weight (I, O, *k) -> flax ConvTranspose kernel:
    spatially flipped, (*k, I, O). Verified exact (1e-15 in f64) for the VALID and
    SAME configs the models use."""
    w = t2n(m.weight)
    w = np.flip(w, axis=tuple(range(2, w.ndim)))
    return np.ascontiguousarray(np.transpose(w, tuple(range(2, w.ndim)) + (0, 1)))


def dense_w(m):
    return {"kernel": t2n(m.weight).T, "bias": t2n(m.bias)} if m.bias is not None \
        else {"kernel": t2n(m.weight).T}


def conv_p(m):
    p = {"kernel": conv_w(m)}
    if m.bias is not None:
        p["bias"] = t2n(m.bias)
    return p


def convT_p(m):
    p = {"kernel": convT_w(m)}
    if m.bias is not None:
        p["bias"] = t2n(m.bias)
    return p


def bn_p(m):
    return {"scale": t2n(m.weight), "bias": t2n(m.bias)}


def bn_s(m):
    return {"mean": t2n(m.running_mean), "var": t2n(m.running_var)}


def vid_t2j(x):
    """(B, C, T, H, W) -> (B, T, H, W, C)"""
    return jnp.asarray(t2n(x).transpose(0, 2, 3, 4, 1))


def img_t2j(x):
    """(B, C, H, W) -> (B, H, W, C)"""
    return jnp.asarray(t2n(x).transpose(0, 2, 3, 1))


def assert_close(j, t, tol=1e-9, what=""):
    j = np.asarray(j, dtype=np.float64)
    t = t2n(t) if isinstance(t, torch.Tensor) else np.asarray(t, dtype=np.float64)
    assert j.shape == t.shape, f"{what}: shape {j.shape} vs {t.shape}"
    scale = max(1.0, float(np.abs(t).max()))
    err = float(np.abs(j - t).max())
    assert err <= tol * scale, f"{what}: max err {err} (scale {scale}, tol {tol})"


@pytest.fixture(autouse=True)
def _f64():
    # float64 on both sides: reference modules create internal tensors with the
    # torch default dtype (ConvLSTM.init_hidden zeros, FrameDiscrim sent_dupe).
    jax.config.update("jax_enable_x64", True)
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        yield
    finally:
        torch.set_default_dtype(prev)
        jax.config.update("jax_enable_x64", False)


def _rand(rng, *shape):
    return torch.tensor(rng.standard_normal(shape), dtype=torch.float64)


# ---------------------------------------------------------------------------
# losses (reference gan/losses.py:41-133)
# ---------------------------------------------------------------------------

class TestLosses:
    @pytest.fixture(autouse=True)
    def _float_labels(self, monkeypatch):
        # torch>=2 infers Long for torch.full(size, int) so the reference's
        # get_labels_for (losses.py:4-5) crashes in BCEWithLogits; under the torch
        # the reference was written for, full() produced floats. Restore that.
        import txt2vid.gan.losses as ref_losses
        monkeypatch.setattr(
            ref_losses, "get_labels_for",
            lambda x, label: torch.full(x.size(), float(label), dtype=x.dtype,
                                        device=x.device))

    def _logits(self):
        rng = np.random.default_rng(0)
        return _rand(rng, 6, 1), _rand(rng, 6, 1)

    def test_vanilla_documented_label_swap(self):
        from txt2vid.gan.losses import VanillaGanLoss as Ref
        fake, real = self._logits()
        ref = Ref()
        jf, jr = jnp.asarray(t2n(fake)), jnp.asarray(t2n(real))
        # reference's swap: its discrim loss == ours with real/fake exchanged
        assert_close(jlosses.VanillaGanLoss().discrim_loss(fake=jr, real=jf),
                     ref.discrim_loss(fake=fake, real=real), tol=1e-6, what="vanilla D")
        # reference gen = BCE(fake, 0) == our BCE(-fake, 1)
        assert_close(jlosses.VanillaGanLoss().gen_loss(fake=-jf),
                     ref.gen_loss(fake=fake), tol=1e-6, what="vanilla G")

    def test_hinge_exact(self):
        from txt2vid.gan.losses import HingeGanLoss as Ref
        fake, real = self._logits()
        ref = Ref()
        jf, jr = jnp.asarray(t2n(fake)), jnp.asarray(t2n(real))
        ours = jlosses.HingeGanLoss()
        assert_close(ours.discrim_loss(fake=jf, real=jr),
                     ref.discrim_loss(fake=fake, real=real), tol=1e-6, what="hinge D")
        assert_close(ours.gen_loss(fake=jf), ref.gen_loss(fake=fake), tol=1e-6, what="hinge G")

    def test_wasserstein_exact(self):
        from txt2vid.gan.losses import WassersteinGanLoss as Ref
        fake, real = self._logits()
        ref = Ref()
        jf, jr = jnp.asarray(t2n(fake)), jnp.asarray(t2n(real))
        ours = jlosses.WassersteinGanLoss()
        assert_close(ours.discrim_loss(fake=jf, real=jr),
                     ref.discrim_loss(fake=fake, real=real), tol=1e-6, what="wgan D")
        assert_close(ours.gen_loss(fake=jf), ref.gen_loss(fake=fake), tol=1e-6, what="wgan G")

    def test_rsgan_exact(self):
        from txt2vid.gan.losses import RSGANLoss as Ref
        fake, real = self._logits()
        ref = Ref()
        jf, jr = jnp.asarray(t2n(fake)), jnp.asarray(t2n(real))
        ours = jlosses.RSGANLoss()
        assert_close(ours.discrim_loss(fake=jf, real=jr),
                     ref.discrim_loss(fake=fake, real=real), tol=1e-6, what="rsgan D")
        assert_close(ours.gen_loss(fake=jf, real=jr),
                     ref.gen_loss(fake=fake, real=real), tol=1e-6, what="rsgan G")

    def test_ralsgan_exact(self):
        from txt2vid.gan.losses import RaLSGANLoss as Ref
        fake, real = self._logits()
        ref = Ref()
        jf, jr = jnp.asarray(t2n(fake)), jnp.asarray(t2n(real))
        ours = jlosses.RaLSGANLoss()
        assert_close(ours.discrim_loss(fake=jf, real=jr),
                     ref.discrim_loss(fake=fake, real=real), tol=1e-6, what="ralsgan D")
        assert_close(ours.gen_loss(fake=jf, real=jr),
                     ref.gen_loss(fake=fake, real=real), tol=1e-6, what="ralsgan G")

    def test_rasgan_reference_is_broken_ours_matches_intent(self):
        from txt2vid.gan.losses import RaSGANLoss as Ref
        fake, real = self._logits()
        with pytest.raises(AttributeError):  # losses.py:95 `self.fake_labels`
            Ref().discrim_loss(fake=fake, real=real)
        # intended formula, computed by hand in torch
        bce = torch.nn.BCEWithLogitsLoss()
        a, b = real - fake.mean(), fake - real.mean()
        d_int = (bce(a, torch.ones_like(a)) + bce(b, torch.zeros_like(b))) / 2
        g_int = (bce(a, torch.zeros_like(a)) + bce(b, torch.ones_like(b))) / 2
        jf, jr = jnp.asarray(t2n(fake)), jnp.asarray(t2n(real))
        ours = jlosses.RaSGANLoss()
        assert_close(ours.discrim_loss(fake=jf, real=jr), d_int, tol=1e-6,
                     what="rasgan D (intended)")
        assert_close(ours.gen_loss(fake=jf, real=jr), g_int, tol=1e-6,
                     what="rasgan G (intended)")

    def test_mixed_combinator(self):
        from txt2vid.gan.losses import MixedGanLoss as RefMixed
        from txt2vid.gan.losses import WassersteinGanLoss as RefW
        from txt2vid.gan.losses import RSGANLoss as RefR
        fake, real = self._logits()
        ref = RefMixed(g_loss=RefW(), d_loss=RefR())
        jf, jr = jnp.asarray(t2n(fake)), jnp.asarray(t2n(real))
        ours = jlosses.MixedGanLoss(g_loss=jlosses.WassersteinGanLoss(),
                                    d_loss=jlosses.RSGANLoss())
        assert_close(ours.discrim_loss(fake=jf, real=jr),
                     ref.discrim_loss(fake=fake, real=real), tol=1e-6, what="mixed D")
        assert_close(ours.gen_loss(fake=jf, real=jr),
                     ref.gen_loss(fake=fake, real=real), tol=1e-6, what="mixed G")


# ---------------------------------------------------------------------------
# attention blocks (reference models/layers.py:10-68)
# ---------------------------------------------------------------------------

class TestAttention:
    def test_attention2d(self):
        from txt2vid.models.layers import Attention as Ref
        from txt2vid_tpu.models.layers import Attention
        rng = np.random.default_rng(1)
        ref = Ref(ch=16).double().eval()
        ref.gamma.data = torch.tensor(0.7, dtype=torch.float64)
        x = _rand(rng, 2, 16, 8, 8)
        with torch.no_grad():
            y_ref = ref(x)
        params = {"theta": conv_p(ref.theta), "phi": conv_p(ref.phi),
                  "g": conv_p(ref.g), "o": conv_p(ref.o),
                  "gamma": t2n(ref.gamma)}
        y = Attention(16, use_pallas=False).apply({"params": params}, img_t2j(x))
        assert_close(np.asarray(y).transpose(0, 3, 1, 2), y_ref, tol=1e-6, what="attention2d")

    def test_attention3d(self):
        from txt2vid.models.layers import Attention3d as Ref
        from txt2vid_tpu.models.layers import Attention3d
        rng = np.random.default_rng(2)
        ref = Ref(ch=16).double().eval()
        ref.gamma.data = torch.tensor(-0.3, dtype=torch.float64)
        x = _rand(rng, 2, 16, 3, 6, 6)
        with torch.no_grad():
            y_ref = ref(x)
        params = {"theta": conv_p(ref.theta), "phi": conv_p(ref.phi),
                  "g": conv_p(ref.g), "o": conv_p(ref.o),
                  "gamma": t2n(ref.gamma)}
        y = Attention3d(16, use_pallas=False).apply({"params": params}, vid_t2j(x))
        assert_close(np.asarray(y).transpose(0, 4, 1, 2, 3), y_ref,
                     tol=1e-6, what="attention3d")


# ---------------------------------------------------------------------------
# up/down/render blocks (reference models/layers.py:152-259)
# ---------------------------------------------------------------------------

def _upblock_params(ref):
    inner = ref.main.inner_module
    p = {"bn1": bn_p(inner[0]), "conv1": conv_p(inner[3]),
         "bn2": bn_p(inner[4]), "conv2": conv_p(inner[6])}
    s = {"bn1": bn_s(inner[0]), "bn2": bn_s(inner[4])}
    if isinstance(ref.main.identity_map, torch.nn.Sequential):
        p["conv_identity"] = conv_p(ref.main.identity_map[1])
    if ref.with_non_local:
        a = ref.attn
        p["attn"] = {"theta": conv_p(a.theta), "phi": conv_p(a.phi),
                     "g": conv_p(a.g), "o": conv_p(a.o), "gamma": t2n(a.gamma)}
    return p, s


class TestBlocks:
    @pytest.mark.parametrize("wide,nonlocal_", [(False, False), (True, True)])
    def test_upblock_train_mode(self, wide, nonlocal_):
        from txt2vid.models.layers import UpBlock as Ref
        from txt2vid_tpu.models.layers import UpBlock
        rng = np.random.default_rng(3)
        ref = Ref(in_channels=12, out_channels=8, wide=wide,
                  with_non_local=nonlocal_).double().train()
        if nonlocal_:
            ref.attn.gamma.data = torch.tensor(0.5, dtype=torch.float64)
        x = _rand(rng, 3, 12, 5, 5)
        y_ref = ref(x)
        p, s = _upblock_params(ref)
        m = UpBlock(12, 8, wide=wide, with_non_local=nonlocal_, use_pallas=False)
        y, _ = m.apply({"params": p, "batch_stats": s}, img_t2j(x), train=True,
                       mutable=["batch_stats"])
        assert_close(np.asarray(y).transpose(0, 3, 1, 2), y_ref, tol=1e-6, what="upblock")

    def test_downsample_shape_aware_odd_dims(self):
        from txt2vid.models.layers import DownSample as Ref
        from txt2vid_tpu.ops.pooling import avg_pool_3d_shape_aware
        rng = np.random.default_rng(4)
        for shape in [(2, 3, 1, 4, 4), (2, 3, 5, 6, 7), (2, 3, 2, 3, 3),
                      (1, 4, 1, 1, 6)]:
            x = _rand(rng, *shape)
            with torch.no_grad():
                y_ref = Ref()(x)
            y = avg_pool_3d_shape_aware(vid_t2j(x))
            assert_close(np.asarray(y).transpose(0, 4, 1, 2, 3), y_ref,
                         what=f"downsample {shape}")

    @pytest.mark.parametrize("wide", [True, False])
    def test_downblock(self, wide):
        from txt2vid.models.layers import DownBlock as Ref
        from txt2vid_tpu.models.layers import DownBlock
        rng = np.random.default_rng(5)
        ref = Ref(in_channels=6, out_channels=10, wide=wide).double().eval()
        x = _rand(rng, 2, 6, 4, 8, 8)
        with torch.no_grad():
            y_ref = ref(x)
        inner = ref.main.inner_module
        p = {"conv1": conv_p(inner[1]), "conv2": conv_p(inner[3]),
             "conv_identity": conv_p(ref.main.identity_map[0])}
        y = DownBlock(6, 10, wide=wide).apply({"params": p}, vid_t2j(x))
        assert_close(np.asarray(y).transpose(0, 4, 1, 2, 3), y_ref, what="downblock")

    def test_renderblock_train_mode(self):
        from txt2vid.models.layers import RenderBlock as Ref
        from txt2vid_tpu.models.layers import RenderBlock
        rng = np.random.default_rng(6)
        ref = Ref(in_channels=8, out_channels=3).double().train()
        x = _rand(rng, 4, 8, 6, 6)
        y_ref = ref(x)
        p = {"bn": bn_p(ref.bn), "conv": conv_p(ref.conv)}
        s = {"bn": bn_s(ref.bn)}
        y, _ = RenderBlock(8, 3).apply({"params": p, "batch_stats": s}, img_t2j(x),
                                       train=True, mutable=["batch_stats"])
        assert_close(np.asarray(y).transpose(0, 3, 1, 2), y_ref, what="renderblock")


# ---------------------------------------------------------------------------
# ConvLSTM (reference models/conv_lstm.py:6-97)
# ---------------------------------------------------------------------------

def _convlstm_params(ref, num_layers):
    """Fuse the reference's 8 per-gate convs into our 4C-fused layout.
    Gate order in our _lstm_gates split: i, f, g(=c), o."""
    p = {"cells": {}}
    for li in range(num_layers):
        cell = getattr(ref, f"cell{li}")
        wx = np.concatenate([conv_w(c) for c in
                             (cell.Wxi, cell.Wxf, cell.Wxc, cell.Wxo)], axis=-1)
        bx = np.concatenate([t2n(c.bias) for c in
                             (cell.Wxi, cell.Wxf, cell.Wxc, cell.Wxo)])
        wh = np.concatenate([conv_w(c) for c in
                             (cell.Whi, cell.Whf, cell.Whc, cell.Who)], axis=-1)
        if li == 0:
            p["wx0"] = {"kernel": wx}
            p["wx0_bias"] = bx
        else:
            p["cells"][f"wx{li}"] = {"kernel": wx, "bias": bx}
        p["cells"][f"wh{li}"] = {"kernel": wh}
    return p


class TestConvLSTM:
    @pytest.mark.parametrize("hw", [(4, 4), (1, 1)])
    def test_multilayer_unroll(self, hw):
        from txt2vid.models.conv_lstm import ConvLSTM as Ref
        from txt2vid_tpu.models.conv_lstm import ConvLSTM
        rng = np.random.default_rng(7)
        hidden = [6, 4]
        steps = 5
        ref = Ref(input_channels=3, hidden_channels=hidden, kernel_size=3,
                  step=steps, effective_step=list(range(steps))).double()
        h, w = hw
        x = _rand(rng, 2, 3, h, w)
        with torch.no_grad():
            outs, _ = ref(x)
        y_ref = torch.stack(outs, dim=1)  # (B, steps, C, h, w)
        p = _convlstm_params(ref, len(hidden))
        m = ConvLSTM(hidden_channels=hidden, kernel_size=3, step=steps)
        y = m.apply({"params": p}, img_t2j(x))
        assert_close(np.asarray(y).transpose(0, 1, 4, 2, 3), y_ref,
                     what=f"convlstm {hw}")


# ---------------------------------------------------------------------------
# Resnet3D discriminator backbone (reference models/resnet3d.py:6-57)
# ---------------------------------------------------------------------------

def _resnet3d_params(ref, num_down_blocks, with_attn, cond_dim):
    inner = ref.res_block.inner_module
    p = {"stem_conv1": conv_p(inner[0]), "stem_conv2": conv_p(inner[2]),
         "stem_skip": conv_p(ref.res_block.identity_map[1]),
         "fc_uncond": dense_w(ref.fc_uncond)}
    mods = list(ref.down)
    di = 0
    for m in mods:
        if m.__class__.__name__ == "Attention3d":
            p["attn"] = {"theta": conv_p(m.theta), "phi": conv_p(m.phi),
                         "g": conv_p(m.g), "o": conv_p(m.o), "gamma": t2n(m.gamma)}
        else:
            inner_d = m.main.inner_module
            p[f"down{di}"] = {"conv1": conv_p(inner_d[1]),
                              "conv2": conv_p(inner_d[3]),
                              "conv_identity": conv_p(m.main.identity_map[0])}
            di += 1
    if cond_dim > 0:
        p["fc"] = dense_w(ref.fc)
    return p


class TestResnet3D:
    def test_uncond_and_cond_heads(self):
        from txt2vid.models.resnet3d import Resnet3D as Ref
        from txt2vid_tpu.models.resnet3d import Resnet3D
        rng = np.random.default_rng(8)
        cond_dim = 8
        ref = Ref(num_channels=3, mid_ch=16, cond_dim=cond_dim, num_down_blocks=2,
                  with_attn=True).double().eval()
        ref.down[1].gamma.data = torch.tensor(0.4, dtype=torch.float64)
        x = _rand(rng, 2, 3, 4, 16, 16)
        cond = _rand(rng, 2, cond_dim)
        with torch.no_grad():
            u_ref, c_ref, f_ref = ref(x=x, cond=cond)
        p = _resnet3d_params(ref, 2, True, cond_dim)
        m = Resnet3D(num_channels=3, mid_ch=16, cond_dim=cond_dim,
                     num_down_blocks=2, with_attn=True, use_pallas=False)
        u, c, f = m.apply({"params": p}, vid_t2j(x), jnp.asarray(t2n(cond)))
        assert_close(u, u_ref, tol=1e-5, what="resnet3d uncond")
        assert_close(c, c_ref, tol=1e-5, what="resnet3d cond")
        assert_close(f, f_ref, tol=1e-5, what="resnet3d feats")

        # computed_features fast path (resnet3d.py:38-41)
        with torch.no_grad():
            u2, c2, _ = ref(cond=cond, computed_features=f_ref)
        ju2, jc2, _ = m.apply({"params": p}, cond=jnp.asarray(t2n(cond)),
                              computed_features=f)
        assert ju2 is None and u2 is None
        assert_close(jc2, c2, tol=1e-5, what="resnet3d cond (cached feats)")


# ---------------------------------------------------------------------------
# TCWYT discriminators (reference models/tcwyt/)
# ---------------------------------------------------------------------------

def _sent_head_params(ref, map_attr):
    """FrameDiscrim/MotionDiscrim -> our _SentTiledHead param tree."""
    fmap = getattr(ref, map_attr)
    return {"head": {
        "map": conv_p(fmap[0]), "map_bn": bn_p(fmap[1]),
        "pred0": conv_p(ref.predictor[0]), "pred_bn": bn_p(ref.predictor[1]),
        "pred1": conv_p(ref.predictor[3]),
        "sent_map": dense_w(ref.sent_map[0]), "sent_bn": bn_p(ref.sent_map[1]),
    }}


def _sent_head_stats(ref, map_attr):
    fmap = getattr(ref, map_attr)
    return {"head": {"map_bn": bn_s(fmap[1]), "pred_bn": bn_s(ref.predictor[1]),
                     "sent_bn": bn_s(ref.sent_map[1])}}


class TestTCWYTDiscrims:
    @pytest.mark.parametrize("use_cond", [True, False])
    def test_video_discrim_cond_and_uncond(self, use_cond):
        from txt2vid.models.tcwyt.video_discrim import VideoDiscrim as Ref
        from txt2vid_tpu.models.tcwyt import VideoDiscrim
        rng = np.random.default_rng(9)
        cond_dim = 16
        x = _rand(rng, 2, 3, 16, 48, 48)
        cond = _rand(rng, 2, cond_dim)

        if True:
            # cond arm must use mid_ch=64: the reference declares pred's second conv
            # with mid_ch*8 input channels but feeds it pred0's 512 output
            # (video_discrim.py:37-40) — only consistent at the default mid_ch=64.
            mid = 64 if use_cond else 8
            ref = Ref(cond_dim=cond_dim if use_cond else 0, mid_ch=mid).double().train()
            xm = ref.x_map
            p = {"conv0": conv_p(xm[0]), "conv1": conv_p(xm[2]), "bn1": bn_p(xm[3]),
                 "conv2": conv_p(xm[5]), "bn2": bn_p(xm[6]),
                 "conv3": conv_p(xm[8]), "bn3": bn_p(xm[9])}
            s = {"bn1": bn_s(xm[3]), "bn2": bn_s(xm[6]), "bn3": bn_s(xm[9])}
            if use_cond:
                p["cond_map"] = dense_w(ref.cond_map[0])
                p["cond_bn"] = bn_p(ref.cond_map[1])
                s["cond_bn"] = bn_s(ref.cond_map[1])
                p["pred0"] = conv_p(ref.pred[0])
                p["pred_bn"] = bn_p(ref.pred[1])
                s["pred_bn"] = bn_s(ref.pred[1])
                p["pred1"] = conv_p(ref.pred[3])
            else:
                p["pred"] = conv_p(ref.pred)
            y_ref = ref(x=x, cond=cond if use_cond else None)
            m = VideoDiscrim(cond_dim=cond_dim if use_cond else 0, mid_ch=mid)
            y, _ = m.apply({"params": p, "batch_stats": s}, vid_t2j(x),
                           jnp.asarray(t2n(cond)) if use_cond else None,
                           train=True, mutable=["batch_stats"])
            # reference returns the batch-mean scalar; ours per-sample (B,) logits
            assert y.shape == (2,)
            assert_close(jnp.mean(y), y_ref, tol=1e-6,
                         what=f"video_discrim cond={use_cond}")

    def test_frame_map_and_frame_motion_discrims(self):
        # EVAL mode with randomized running stats: in train mode the reference's
        # per-frame Python loop (frame_discrim.py:67-90) computes BatchNorm batch
        # statistics PER FRAME, while our batch fold normalizes over (B*T) jointly —
        # a documented deviation (txt2vid_tpu/models/tcwyt.py docstring). With
        # running stats the fold is exactly equivalent, which is what we assert.
        from txt2vid.models.tcwyt.frame_discrim import FrameMap as RefMap
        from txt2vid.models.tcwyt.frame_discrim import FrameDiscrim as RefFrame
        from txt2vid.models.tcwyt.motion_discrim import MotionDiscrim as RefMotion
        from txt2vid_tpu.models.tcwyt import FrameMap, FrameDiscrim, MotionDiscrim
        rng = np.random.default_rng(10)
        cond_dim = 12
        vids = _rand(rng, 2, 3, 4, 48, 48)
        cond = _rand(rng, 2, cond_dim)

        def randomize_bn(mod):
            for m in mod.modules():
                if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                    m.running_mean.normal_(generator=torch.Generator().manual_seed(1))
                    m.running_var.uniform_(0.5, 1.5)

        ref_map = RefMap().double().eval()
        randomize_bn(ref_map)
        with torch.no_grad():
            xb_ref = ref_map(vids)          # (T, B, 512, 3, 3)
        fm = ref_map.frame_map
        p_map = {"conv0": conv_p(fm[0]), "bn0": bn_p(fm[1]),
                 "conv1": conv_p(fm[3]), "bn1": bn_p(fm[4]),
                 "conv2": conv_p(fm[6]), "bn2": bn_p(fm[7]),
                 "conv3": conv_p(fm[9])}
        s_map = {"bn0": bn_s(fm[1]), "bn1": bn_s(fm[4]), "bn2": bn_s(fm[7])}
        xb = FrameMap().apply({"params": p_map, "batch_stats": s_map},
                                 vid_t2j(vids), train=False)
        # layouts: ref (T, B, C, H, W) vs ours (B, T, H, W, C)
        assert_close(np.asarray(xb).transpose(1, 0, 4, 2, 3), xb_ref,
                     tol=1e-6, what="frame_map")

        ref_f = RefFrame(cond_dim=cond_dim).double().eval()
        randomize_bn(ref_f)
        with torch.no_grad():
            y_ref = ref_f(cond=cond, xbar=xb_ref)            # (T, B)
        y = FrameDiscrim(cond_dim=cond_dim).apply(
            {"params": _sent_head_params(ref_f, "frame_map"),
             "batch_stats": _sent_head_stats(ref_f, "frame_map")},
            cond=jnp.asarray(t2n(cond)), xbar=xb, train=False)
        assert_close(np.asarray(y).T, y_ref, tol=1e-6, what="frame_discrim")

        ref_m = RefMotion(cond_dim=cond_dim).double().eval()
        randomize_bn(ref_m)
        with torch.no_grad():
            ym_ref = ref_m(cond=cond, xbar=xb_ref)           # (T-1, B)
        ym = MotionDiscrim(cond_dim=cond_dim).apply(
            {"params": _sent_head_params(ref_m, "motion_map"),
             "batch_stats": _sent_head_stats(ref_m, "motion_map")},
            cond=jnp.asarray(t2n(cond)), xbar=xb, train=False)
        assert_close(np.asarray(ym).T, ym_ref, tol=1e-6, what="motion_discrim")


# ---------------------------------------------------------------------------
# gradient penalty (reference gan/losses.py:135-209)
# ---------------------------------------------------------------------------

class TestGradientPenalty:
    def _tiny_discrims(self, cond_dim):
        """Reference Resnet3D + our transplanted copy, tiny config, no attention."""
        from txt2vid.models.resnet3d import Resnet3D as Ref
        from txt2vid_tpu.models.resnet3d import Resnet3D
        ref = Ref(num_channels=2, mid_ch=4, cond_dim=cond_dim, num_down_blocks=1,
                  with_attn=False).double().eval()
        p = _resnet3d_params(ref, 1, False, cond_dim)
        m = Resnet3D(num_channels=2, mid_ch=4, cond_dim=cond_dim,
                     num_down_blocks=1, with_attn=False)
        return ref, m, p

    def _fixed_alpha(self, monkeypatch, b):
        alpha = np.random.default_rng(11).random(b)
        real_rand = torch.rand

        def fake_rand(*shape, **kw):
            if shape and shape[0] == b:
                t = torch.tensor(alpha.reshape(shape), dtype=torch.float64)
                t.requires_grad_(kw.get("requires_grad", False))
                return t
            return real_rand(*shape, **kw)

        monkeypatch.setattr(torch, "rand", fake_rand)
        monkeypatch.setattr(
            jax.random, "uniform",
            lambda key, shape=(), **kw: jnp.asarray(alpha).reshape(shape))
        return alpha

    @pytest.mark.parametrize("use_cond", [False, True])
    def test_single_scale(self, monkeypatch, use_cond):
        from txt2vid.gan.losses import gradient_penalty as ref_gp
        rng = np.random.default_rng(12)
        b, cond_dim = 3, 6
        ref, m, p = self._tiny_discrims(cond_dim if use_cond else 0)
        real = _rand(rng, b, 2, 2, 8, 8)
        fake = _rand(rng, b, 2, 2, 8, 8)
        rc = _rand(rng, b, cond_dim) if use_cond else None
        fc = _rand(rng, b, cond_dim) if use_cond else None
        self._fixed_alpha(monkeypatch, b)

        gp_ref = ref_gp(ref, real_x=real, fake_x=fake, real_cond=rc, fake_cond=fc)

        def d_fn(x, cond, xbar):
            u, c, _ = m.apply({"params": p}, x, cond, xbar)
            return u, c

        gp = jlosses.gradient_penalty(
            d_fn, jax.random.PRNGKey(0), vid_t2j(real), vid_t2j(fake),
            real_cond=None if rc is None else jnp.asarray(t2n(rc)),
            fake_cond=None if fc is None else jnp.asarray(t2n(fc)))
        assert_close(gp, gp_ref, tol=1e-5, what=f"gp cond={use_cond}")

    def test_multiscale_sub_discrims(self, monkeypatch):
        from txt2vid.gan.losses import gradient_penalty as ref_gp
        rng = np.random.default_rng(13)
        b = 3
        ref_a, m_a, p_a = self._tiny_discrims(0)
        ref_b, m_b, p_b = self._tiny_discrims(0)
        holder = types.SimpleNamespace(sub_discrims=[ref_a, ref_b])
        reals = [_rand(rng, b, 2, 2, 8, 8), _rand(rng, b, 2, 4, 16, 16)]
        fakes = [_rand(rng, b, 2, 2, 8, 8), _rand(rng, b, 2, 4, 16, 16)]
        self._fixed_alpha(monkeypatch, b)

        gp_ref = ref_gp(holder, real_x=reals, fake_x=fakes)

        def d_fn_for_scale(i):
            m, p = [(m_a, p_a), (m_b, p_b)][i]

            def d_fn(x, cond, xbar):
                u, c, _ = m.apply({"params": p}, x, cond, xbar)
                return u, c
            return d_fn

        gp = jlosses.multiscale_gradient_penalty(
            d_fn_for_scale, jax.random.PRNGKey(0),
            [vid_t2j(r) for r in reals], [vid_t2j(f) for f in fakes])
        assert_close(gp, gp_ref, tol=1e-5, what="multiscale gp")


# ---------------------------------------------------------------------------
# TCWYT / TGAN generators (reference models/tcwyt/gen.py, models/tgan/)
# ---------------------------------------------------------------------------

class TestGenerators:
    def test_tcwyt_gen(self):
        from txt2vid.models.tcwyt.gen import Gen as Ref
        from txt2vid_tpu.models.tcwyt import Gen
        rng = np.random.default_rng(14)
        z_size, cond_dim = 10, 6
        ref = Ref(z_size=z_size, cond_dim=cond_dim, num_channels=3,
                  scale_factor=0.125).double().train()
        z = _rand(rng, 4, z_size)
        cond = _rand(rng, 4, cond_dim)
        y_ref = ref(z, cond=cond)  # (B, 3, 16, 48, 48)
        seq = ref.seq
        p = {"input_map": dense_w(ref.input_map[0]), "input_bn": bn_p(ref.input_map[1]),
             "dc0": convT_p(seq[0]), "bn0": bn_p(seq[1]),
             "dc1": convT_p(seq[3]), "bn1": bn_p(seq[4]),
             "dc2": convT_p(seq[6]), "bn2": bn_p(seq[7]),
             "dc3": convT_p(seq[9]), "bn3": bn_p(seq[10]),
             "dc4": convT_p(seq[12])}
        s = {"input_bn": bn_s(ref.input_map[1]), "bn0": bn_s(seq[1]),
             "bn1": bn_s(seq[4]), "bn2": bn_s(seq[7]), "bn3": bn_s(seq[10])}
        m = Gen(z_size=z_size, cond_dim=cond_dim, num_channels=3, scale_factor=0.125)
        y, _ = m.apply({"params": p, "batch_stats": s}, jnp.asarray(t2n(z)),
                       jnp.asarray(t2n(cond)), train=True, mutable=["batch_stats"])
        assert_close(np.asarray(y).transpose(0, 4, 1, 2, 3), y_ref, tol=1e-6,
                     what="tcwyt gen")

    def test_tgan_gen_with_cond(self):
        from txt2vid.models.tgan.gen import Gen as Ref
        from txt2vid_tpu.models.tgan import Gen
        rng = np.random.default_rng(15)
        ref = Ref(z_slow_dim=8, z_fast_dim=8, cond_dim=4, out_channels=3,
                  bottom_width=4, conv_ch=32).double().train()
        z = _rand(rng, 3, 8)
        cond = _rand(rng, 3, 4)
        y_ref = ref(z, cond=cond)  # (B, C, T, 64, 64)

        fs, vg = ref._fsgen, ref._vgen
        p_fs = {"dc0": convT_p(fs.dc0), "bn0": bn_p(fs.bn0),
                "dc1": convT_p(fs.dc1), "bn1": bn_p(fs.bn1),
                "dc2": convT_p(fs.dc2), "bn2": bn_p(fs.bn2),
                "dc3": convT_p(fs.dc3), "bn3": bn_p(fs.bn3),
                "dc4": convT_p(fs.dc4)}
        s_fs = {f"bn{i}": bn_s(getattr(fs, f"bn{i}")) for i in range(4)}
        # torch views the (B, mid) dense output as (C, bw, bw) c-major; ours
        # reshapes to (bw, bw, C) — permute the dense/BN output indices to match.
        bw, ch = 4, 32
        perm = np.arange(bw * bw * ch // 2).reshape(ch // 2, bw, bw) \
            .transpose(1, 2, 0).reshape(-1)

        def dense_perm(m):
            d = dense_w(m)
            return {"kernel": d["kernel"][:, perm], "bias": d["bias"][perm]}

        def bn_perm(fn, m):
            return {k: v[perm] for k, v in fn(m).items()}

        p_vg = {"l0s": dense_perm(vg.l0s), "l0f": dense_perm(vg.l0f),
                "bn0s": bn_perm(bn_p, vg.bn0s), "bn0f": bn_perm(bn_p, vg.bn0f)}
        s_vg = {"bn0s": bn_perm(bn_s, vg.bn0s), "bn0f": bn_perm(bn_s, vg.bn0f)}
        for i in range(1, 5):
            p_vg[f"dc{i}"] = convT_p(getattr(vg, f"dc{i}"))
            p_vg[f"bn{i}"] = bn_p(getattr(vg, f"bn{i}"))
            s_vg[f"bn{i}"] = bn_s(getattr(vg, f"bn{i}"))
        p_vg["dc5"] = convT_p(vg.dc5)

        m = Gen(z_slow_dim=8, z_fast_dim=8, cond_dim=4, out_channels=3,
                bottom_width=4, conv_ch=32)
        y, _ = m.apply({"params": {"fsgen": p_fs, "vgen": p_vg},
                        "batch_stats": {"fsgen": s_fs, "vgen": s_vg}},
                       jnp.asarray(t2n(z)), jnp.asarray(t2n(cond)), train=True,
                       mutable=["batch_stats"])
        # ours (B, T, H, W, C) vs ref (B, C, T, H, W)
        assert_close(np.asarray(y).transpose(0, 4, 1, 2, 3), y_ref, tol=1e-6,
                     what="tgan gen")
        # documented reference quirk: the fast-path BN in VideoFrameGenerator sees
        # (B*T) rows because time is folded into batch BEFORE the decoder — same
        # fold in both implementations, so train-mode stats agree exactly.


# ---------------------------------------------------------------------------
# image WGAN-GP pair (reference models/img/models.py)
# ---------------------------------------------------------------------------

def _img_upblock_p(rb):
    p = {"conv_shortcut": conv_p(rb.conv_shortcut.conv.conv),
         "conv1": conv_p(rb.conv_1.conv.conv), "conv2": conv_p(rb.conv_2.conv),
         "bn1": bn_p(rb.bn1), "bn2": bn_p(rb.bn2)}
    s = {"bn1": bn_s(rb.bn1), "bn2": bn_s(rb.bn2)}
    return p, s


def _ln_p(m):
    """torch LayerNorm([C, H, W]) affine -> ours (H, W, C)."""
    return {"scale": t2n(m.weight).transpose(1, 2, 0),
            "bias": t2n(m.bias).transpose(1, 2, 0)}


def _img_downblock_p(rb):
    return {"conv_shortcut": conv_p(rb.conv_shortcut.conv.conv),
            "conv1": conv_p(rb.conv_1.conv), "conv2": conv_p(rb.conv_2.conv.conv),
            "ln1": _ln_p(rb.bn1), "ln2": _ln_p(rb.bn2)}


class TestImgModels:
    def test_gen(self):
        from txt2vid.models.img.models import Gen as Ref
        from txt2vid_tpu.models.img import Gen
        rng = np.random.default_rng(16)
        ref = Ref().double().train()
        ref.dim = 64
        z = _rand(rng, 2, 128)
        y_ref = ref(z)  # (B, 3, 64, 64)
        d = 64
        # ln1 rows are (c, h, w)-major in torch, (h, w, c)-major in ours
        w = t2n(ref.ln1.weight)          # (4*4*8d, 128)
        w = w.reshape(8 * d, 4, 4, 128).transpose(1, 2, 0, 3).reshape(-1, 128)
        b = t2n(ref.ln1.bias).reshape(8 * d, 4, 4).transpose(1, 2, 0).reshape(-1)
        p = {"ln1": {"kernel": w.T, "bias": b}, "bn": bn_p(ref.bn),
             "conv1": conv_p(ref.conv1.conv)}
        s = {"bn": bn_s(ref.bn)}
        for i in range(1, 5):
            p[f"rb{i}"], s[f"rb{i}"] = _img_upblock_p(getattr(ref, f"rb{i}"))
        m = Gen()
        y, _ = m.apply({"params": p, "batch_stats": s}, jnp.asarray(t2n(z)),
                       train=True, mutable=["batch_stats"])
        assert_close(np.asarray(y).transpose(0, 3, 1, 2), y_ref, tol=1e-6,
                     what="img gen")

    def test_discrim(self):
        from txt2vid.models.img.models import Discrim as Ref
        from txt2vid_tpu.models.img import Discrim
        rng = np.random.default_rng(17)
        ref = Ref().double().eval()
        x = _rand(rng, 2, 3, 64, 64)
        with torch.no_grad():
            y_ref = ref(x=x)
        d = 64
        w = t2n(ref.ln1.weight)          # (1, 4*4*8d), rows (c,h,w)-major
        w = w.reshape(1, 8 * d, 4, 4).transpose(0, 2, 3, 1).reshape(1, -1)
        p = {"conv1": conv_p(ref.conv1.conv),
             "ln1": {"kernel": w.T, "bias": t2n(ref.ln1.bias)}}
        for i in range(1, 5):
            p[f"rb{i}"] = _img_downblock_p(getattr(ref, f"rb{i}"))
        y = Discrim().apply({"params": p}, img_t2j(x))
        assert_close(y, y_ref, tol=1e-5, what="img discrim")


# ---------------------------------------------------------------------------
# Bi-LSTM sentence encoder (reference models/txt/basic.py)
# ---------------------------------------------------------------------------

def _lstm_layer_p(ref_lstm, layer, reverse):
    sfx = f"_l{layer}" + ("_reverse" if reverse else "")
    w_ih = t2n(getattr(ref_lstm, f"weight_ih{sfx}"))   # (4H, in) gates i,f,g,o
    w_hh = t2n(getattr(ref_lstm, f"weight_hh{sfx}"))
    b = t2n(getattr(ref_lstm, f"bias_ih{sfx}")) + t2n(getattr(ref_lstm, f"bias_hh{sfx}"))
    hdim = w_hh.shape[1]
    cell = {}
    for gi, g in enumerate(("i", "f", "g", "o")):
        sl = slice(gi * hdim, (gi + 1) * hdim)
        cell[f"i{g}"] = {"kernel": w_ih[sl].T}
        cell[f"h{g}"] = {"kernel": w_hh[sl].T, "bias": b[sl]}
    return {"cell": cell}


def _seq2seq_params(ref):
    enc = {"embed": {"embedding": t2n(ref.encoder.embed.weight)}}
    for i in range(ref.encoder.num_layers):
        enc[f"l{i}_fwd"] = _lstm_layer_p(ref.encoder.lstm, i, False)
        enc[f"l{i}_bwd"] = _lstm_layer_p(ref.encoder.lstm, i, True)
    if ref.encoder.is_decoder:
        enc["to_vocab"] = dense_w(ref.encoder.to_vocab)
    return {"encoder": enc}


class TestTxtEncoder:
    def test_encode_ragged_lengths_and_hn(self):
        from txt2vid.models.txt.basic import Seq2Seq as Ref
        from txt2vid_tpu.models.txt import Seq2Seq
        rng = np.random.default_rng(18)
        vocab = 13
        ref = Ref(vocab_size=vocab).double()
        lengths = [6, 4, 3]  # desc-sorted, as the reference collate guarantees
        toks = torch.tensor(rng.integers(0, vocab, (3, 6)), dtype=torch.long)
        with torch.no_grad():
            out_ref, _, hn_ref = ref.encode(toks, lengths=lengths)
        m = Seq2Seq(vocab_size=vocab)
        p = _seq2seq_params(ref)
        # explicit f64 zero carries: flax RNN's default zero-carry is param_dtype
        # (f32), which under x64 would clash with the f64 scan outputs
        zero = (jnp.zeros((3, 128)), jnp.zeros((3, 128)))
        init_state = [(zero, zero)] * 4
        out, _, hn = m.apply(
            {"params": p}, jnp.asarray(toks.numpy()),
            jnp.asarray(np.array(lengths)), init_state,
            method=lambda mdl, x, l, st: mdl.encoder(x, lengths=l,
                                                     initial_state=st))
        assert_close(hn, hn_ref, tol=1e-6, what="seq2seq hn")
        # per-sample valid positions only (padded tail semantics differ: torch
        # zeros them, our scan keeps computing)
        for bi, L in enumerate(lengths):
            assert_close(np.asarray(out)[bi, :L], out_ref[bi, :L], tol=1e-6,
                         what=f"seq2seq out[{bi}]")

    def test_teacher_forced_decode(self):
        from txt2vid.models.txt.basic import Seq2Seq as Ref
        from txt2vid_tpu.models.txt import Seq2Seq
        rng = np.random.default_rng(19)
        vocab = 13
        ref = Ref(vocab_size=vocab).double()
        toks = torch.tensor(rng.integers(0, vocab, (2, 5)), dtype=torch.long)
        with torch.no_grad():
            raw_ref, sym_ref = ref.decode(true_inputs=toks, max_seq_len=5,
                                          teacher_force=True)
        m = Seq2Seq(vocab_size=vocab)
        p = _seq2seq_params(ref)
        raw, sym = m.apply({"params": p}, jnp.asarray(toks.numpy()),
                           max_seq_len=5, teacher_force=True,
                           method=Seq2Seq.decode)
        assert_close(raw, raw_ref, tol=1e-6, what="decode raw")
        np.testing.assert_array_equal(np.asarray(sym), t2n(sym_ref))


# ---------------------------------------------------------------------------
# FULL-MODEL TGANv2 wiring parity (reference models/tganv2/)
# ---------------------------------------------------------------------------

class TestTGANv2FullModel:
    """End-to-end generator/discriminator parity — catches wiring bugs the
    block tests cannot (fc latent-plane reshape order, block/render pairing,
    eval-mode render selection, per-scale discriminator dispatch). The
    reference's in-forward data_parallel needs CUDA; monkeypatched to a direct
    call (exactly its single-device semantics)."""

    @pytest.fixture(autouse=True)
    def _no_data_parallel(self, monkeypatch):
        import torch.nn.parallel as tnp
        monkeypatch.setattr(tnp, "data_parallel",
                            lambda module, inputs, *a, **k: module(inputs))

    def _randomize_bn(self, mod):
        for m in mod.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.normal_(generator=torch.Generator().manual_seed(2))
                m.running_var.uniform_(0.5, 1.5)

    def test_generator_eval_mode(self):
        from txt2vid.models.tganv2.gen import MultiScaleGen as Ref
        from txt2vid_tpu.models.tganv2 import MultiScaleGen
        rng = np.random.default_rng(20)
        # fm_channels MUST be 1024: the reference hardcodes BaseFrameGen's 1024
        # input (tganv2/gen.py:46 `base = BaseFrameGen()`)
        ref = Ref(latent_size=12, width=64, height=64, num_channels=1,
                  additional_blocks=[8], fm_channels=1024,
                  num_frames=4).double().eval()
        self._randomize_bn(ref)
        z = _rand(rng, 2, 12)
        with torch.no_grad():
            r_ref = ref(z)          # eval: [final scale] (B, C, T, H, W)
        assert len(r_ref) == 1

        # transplant --------------------------------------------------------
        # fc output is viewed (C, H, W) c-major by the reference and reshaped
        # (H, W, C) by ours — permute the dense output rows (identity at the
        # 1x1 latent plane of 64px configs, general otherwise)
        fm_c, fm_h, fm_w = 1024, 1, 1
        perm = np.arange(fm_c * fm_h * fm_w).reshape(fm_c, fm_h, fm_w) \
            .transpose(1, 2, 0).reshape(-1)
        fc = dense_w(ref.fc)
        p = {"fc": {"kernel": fc["kernel"][:, perm], "bias": fc["bias"][perm]},
             "clstm": _convlstm_params(ref.clstm, 1)}
        base = ref.abstract_blocks[0]
        p["base"] = {}
        for i in range(3):
            bp, bs = _upblock_params(getattr(base, f"up{i}"))
            p["base"][f"up{i}"] = bp
        p["up0"], _ = _upblock_params(ref.abstract_blocks[1])
        for name, rb in (("render_base", ref.render_blocks[0]),
                         ("render0", ref.render_blocks[1])):
            p[name] = {"bn": bn_p(rb.bn), "conv": conv_p(rb.conv)}

        stats = {"base": {}}
        for i in range(3):
            _, bs = _upblock_params(getattr(base, f"up{i}"))
            stats["base"][f"up{i}"] = bs
        _, stats["up0"] = _upblock_params(ref.abstract_blocks[1])
        stats["render_base"] = {"bn": bn_s(ref.render_blocks[0].bn)}
        stats["render0"] = {"bn": bn_s(ref.render_blocks[1].bn)}

        m = MultiScaleGen(latent_size=12, width=64, height=64, num_channels=1,
                          additional_blocks=(8,), fm_channels=1024, num_frames=4,
                          use_pallas=False)
        out = m.apply({"params": p, "batch_stats": stats},
                      jnp.asarray(t2n(z)), train=False)
        assert len(out) == 1
        assert_close(np.asarray(out[0]).transpose(0, 4, 1, 2, 3), r_ref[0],
                     tol=1e-6, what="tganv2 full gen (eval)")

    def test_discriminator_multi_scale(self):
        from txt2vid.models.tganv2.discrim import MultiScaleDiscrim as Ref
        from txt2vid_tpu.models.tganv2 import MultiScaleDiscrim
        rng = np.random.default_rng(21)
        ref = Ref(discrim_down_blocks=[1, 1], num_channels=1).double().eval()
        ref.single_discrim.down[1].gamma.data = \
            torch.tensor(0.3, dtype=torch.float64)
        xs = [_rand(rng, 2, 1, 4, 16, 16), _rand(rng, 2, 1, 8, 32, 32)]
        with torch.no_grad():
            out_ref = ref(x=xs)
        p = {"discrim": _resnet3d_params(ref.single_discrim, 1, True, 0)}
        m = MultiScaleDiscrim(discrim_down_blocks=(1, 1), num_channels=1,
                              use_pallas=False)
        out = m.apply({"params": p}, [vid_t2j(x) for x in xs])
        for i, ((u, c, f), (u_ref, c_ref, f_ref)) in enumerate(zip(out, out_ref)):
            assert c is None and c_ref is None
            assert_close(u, u_ref, tol=1e-5, what=f"msd uncond scale {i}")
            assert_close(f, f_ref, tol=1e-5, what=f"msd feats scale {i}")


class TestTGANv2CondFullModel:
    """Conditional variant (reference models/tganv2_cond/): fc over [z ‖ cond],
    non-local Attention on additional block len-2, per-scale conditional heads
    behind nn.DataParallel wrappers (single-device passthrough on CPU)."""

    @pytest.fixture(autouse=True)
    def _no_data_parallel(self, monkeypatch):
        import torch.nn.parallel as tnp
        monkeypatch.setattr(tnp, "data_parallel",
                            lambda module, inputs, *a, **k: module(inputs))

    def test_generator_eval_mode_with_attention(self):
        from txt2vid.models.tganv2_cond.gen import MultiScaleGen as Ref
        from txt2vid_tpu.models.tganv2_cond import MultiScaleGen
        rng = np.random.default_rng(22)
        # two additional blocks so the non-local Attention site (i == len-2 ==
        # 0) is exercised
        ref = Ref(latent_size=8, width=64, height=64, num_channels=1,
                  additional_blocks=[8, 8], fm_channels=1024, num_frames=4,
                  cond_dim=6).double().eval()
        for m in ref.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.normal_(generator=torch.Generator().manual_seed(3))
                m.running_var.uniform_(0.5, 1.5)
        ref.abstract_blocks[1].attn.gamma.data = \
            torch.tensor(0.6, dtype=torch.float64)
        z = _rand(rng, 2, 8)
        cond = _rand(rng, 2, 6)
        with torch.no_grad():
            r_ref = ref(z, cond=cond)
        assert len(r_ref) == 1

        p = {"fc": dense_w(ref.fc),   # 1x1 latent plane: c-major perm is identity
             "clstm": _convlstm_params(ref.clstm, 1)}
        stats = {"base": {}}
        p["base"] = {}
        for i in range(3):
            bp, bs = _upblock_params(getattr(ref.abstract_blocks[0], f"up{i}"))
            p["base"][f"up{i}"] = bp
            stats["base"][f"up{i}"] = bs
        for i in (0, 1):
            p[f"up{i}"], stats[f"up{i}"] = _upblock_params(ref.abstract_blocks[1 + i])
        for name, rb in (("render_base", ref.render_blocks[0]),
                         ("render0", ref.render_blocks[1]),
                         ("render1", ref.render_blocks[2])):
            p[name] = {"bn": bn_p(rb.bn), "conv": conv_p(rb.conv)}
            stats[name] = {"bn": bn_s(rb.bn)}

        m = MultiScaleGen(latent_size=8, num_channels=1, additional_blocks=(8, 8),
                          fm_channels=1024, num_frames=4, cond_dim=6,
                          use_pallas=False)
        out = m.apply({"params": p, "batch_stats": stats},
                      jnp.asarray(t2n(z)), cond=jnp.asarray(t2n(cond)),
                      train=False)
        assert len(out) == 1
        assert_close(np.asarray(out[0]).transpose(0, 4, 1, 2, 3), r_ref[0],
                     tol=1e-6, what="tganv2_cond full gen (eval)")

    def test_discriminator_cond_heads(self):
        from txt2vid.models.tganv2_cond.discrim import MultiScaleDiscrim as Ref
        from txt2vid_tpu.models.tganv2_cond import MultiScaleDiscrim
        rng = np.random.default_rng(23)
        cond_dim = 6
        ref = Ref(discrim_down_blocks=[1, 1], num_channels=1,
                  cond_dim=cond_dim).double().eval()
        inner = ref.single_discrim.module      # unwrap nn.DataParallel
        inner.down[1].gamma.data = torch.tensor(-0.2, dtype=torch.float64)
        xs = [_rand(rng, 2, 1, 4, 16, 16), _rand(rng, 2, 1, 8, 32, 32)]
        conds = [_rand(rng, 2, cond_dim), _rand(rng, 2, cond_dim)]
        with torch.no_grad():
            out_ref = ref(x=xs, cond=conds)
        p = {"discrim": _resnet3d_params(inner, 1, True, cond_dim)}
        m = MultiScaleDiscrim(discrim_down_blocks=(1, 1), num_channels=1,
                              cond_dim=cond_dim, use_pallas=False)
        out = m.apply({"params": p}, [vid_t2j(x) for x in xs],
                      [jnp.asarray(t2n(c)) for c in conds])
        for i, ((u, c, f), (u_ref, c_ref, f_ref)) in enumerate(zip(out, out_ref)):
            assert_close(u, u_ref, tol=1e-5, what=f"cond msd uncond scale {i}")
            assert_close(c, c_ref, tol=1e-5, what=f"cond msd cond scale {i}")
            assert_close(f, f_ref, tol=1e-5, what=f"cond msd feats scale {i}")
