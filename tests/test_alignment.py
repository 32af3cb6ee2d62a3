"""Caption-alignment metric tests: the motion classifier must recover every motion
class from rendered clips, and the trained-feature FID path must produce features
from a discriminator state."""

import numpy as np
import pytest

from txt2vid_tpu.data.synthetic import render_video
from txt2vid_tpu.eval.alignment import (MOTION_CLASSES, caption_motion_class,
                                        classify_motion)


def _glyph():
    g = np.zeros((12, 12), np.uint8)
    g[2:10, 2:10] = 255
    return g


class TestMotionClassifier:
    def test_caption_parse(self):
        assert caption_motion_class("digit 3 is left and right.") == 0
        assert caption_motion_class("digit 0 is right and left.") == 1
        assert caption_motion_class("DIGIT 9 IS TOP AND BOTTOM.") == 2
        assert caption_motion_class("digit 5 is bottom and top.") == 3
        assert caption_motion_class("a cat sits.") is None

    @pytest.mark.parametrize("cls,a,b", [
        (0, (2, 26), (50, 26)),    # left -> right
        (1, (50, 26), (2, 26)),    # right -> left
        (2, (26, 2), (26, 50)),    # top -> bottom
        (3, (26, 50), (26, 2)),    # bottom -> top
    ])
    def test_rendered_clip_classified(self, cls, a, b):
        v = render_video(_glyph(), (64, 64), num_frames=16, animation_len=12,
                         from_pt=a, to_pt=b)
        v = v.astype(np.float32) / 127.5 - 1.0
        pred, axis = classify_motion(v)
        assert pred == cls
        assert axis == (0 if cls < 2 else 1)

    def test_classifier_on_generated_noise_is_defined(self):
        # garbage input must still produce a class (no crash / nan)
        rng = np.random.default_rng(0)
        v = rng.standard_normal((16, 64, 64, 1)).astype(np.float32).clip(-1, 1)
        pred, _ = classify_motion(v)
        assert pred in range(4)


class TestDiscrimFID:
    def test_discrim_feature_fid_separates(self):
        """Features from a (random-init) discriminator state feed FID; identical
        sets score ~0, disjoint distributions score higher."""
        import jax
        import jax.numpy as jnp
        import optax

        from txt2vid_tpu.eval.metrics import discrim_features, fid_from_features
        from txt2vid_tpu.gan.cond_gan import CondGan
        from txt2vid_tpu.gan.train_step import TrainConfig, init_state
        from txt2vid_tpu.models import tganv2, tcwyt

        gen = tcwyt.Gen(z_size=8, num_channels=1)
        discrim = tganv2.MultiScaleDiscrim(discrim_down_blocks=(1,),
                                           num_channels=1, with_attn=False,
                                           use_pallas=False)
        gan = CondGan(gen=gen, discrims=[discrim])
        cfg = TrainConfig(frame_sizes=(16,), latent_size=8, img_model=False)
        batch = {"video": jnp.zeros((4, 4, 16, 16, 1), jnp.float32)}
        opt = optax.adam(1e-4)
        state = init_state(gan, jax.random.key(0), batch, opt, opt, cfg)

        rng = np.random.default_rng(1)
        a = rng.standard_normal((8, 4, 16, 16, 1)).astype(np.float32).clip(-1, 1)
        b = (rng.standard_normal((8, 4, 16, 16, 1)) * 0.1 + 0.7) \
            .astype(np.float32).clip(-1, 1)

        fa = discrim_features(gan, state, a, batch_size=4)
        assert fa.shape[0] == 8 and fa.ndim == 2
        same = fid_from_features(fa, discrim_features(gan, state, a, batch_size=4))
        diff = fid_from_features(fa, discrim_features(gan, state, b, batch_size=4))
        assert same == pytest.approx(0.0, abs=1e-3)
        assert diff > same + 1e-2


class TestDigitClassifier:
    def test_digit_recovered_from_rendered_clip(self):
        from txt2vid_tpu.data.synthetic import _glyph_digits
        from txt2vid_tpu.eval.alignment import classify_digit

        glyphs = _glyph_digits()
        ok = 0
        for d in range(10):
            v = render_video(glyphs[d][0], (64, 64), num_frames=16,
                             animation_len=12, from_pt=(2, 20), to_pt=(34, 20))
            v = v.astype(np.float32) / 127.5 - 1.0
            ok += int(classify_digit(v) == d)
        assert ok >= 9, f"only {ok}/10 digits recovered"
