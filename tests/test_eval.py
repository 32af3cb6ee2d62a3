"""Tests for the sample-fidelity metrics."""

import numpy as np
import pytest

from txt2vid_tpu.eval.metrics import (
    fid_from_features, frechet_distance, sample_fidelity_report)


class TestFrechet:
    def test_identical_is_zero(self):
        rng = np.random.default_rng(0)
        f = rng.standard_normal((200, 8))
        assert fid_from_features(f, f) == pytest.approx(0.0, abs=1e-6)

    def test_mean_shift(self):
        # identical covariance, mean shift d => FID = ||d||^2
        mu1, mu2 = np.zeros(4), np.array([1.0, 0, 0, 0])
        s = np.eye(4)
        assert frechet_distance(mu1, s, mu2, s) == pytest.approx(1.0, rel=1e-4)

    def test_variance_difference(self):
        # N(0, 1) vs N(0, 4) in 1d: FID = 0 + (1 + 4 - 2*2) = 1
        assert frechet_distance(np.zeros(1), np.eye(1), np.zeros(1),
                                4 * np.eye(1)) == pytest.approx(1.0, rel=1e-4)

    def test_discriminates_distributions(self):
        rng = np.random.default_rng(1)
        a = rng.standard_normal((500, 8))
        b = rng.standard_normal((500, 8))
        c = rng.standard_normal((500, 8)) * 3 + 2
        near = fid_from_features(a, b)
        far = fid_from_features(a, c)
        assert far > near * 5


class TestReport:
    def test_video_report(self):
        rng = np.random.default_rng(2)
        real = rng.standard_normal((16, 4, 16, 16, 1)).astype(np.float32).clip(-1, 1)
        fake_close = real + 0.01 * rng.standard_normal(real.shape).astype(np.float32)
        fake_far = rng.uniform(-1, 1, real.shape).astype(np.float32)
        r_close = sample_fidelity_report(real, fake_close)
        r_far = sample_fidelity_report(real, fake_far)
        assert r_far["fid_random_conv"] > r_close["fid_random_conv"]


class TestFrozenClassifier:
    def test_caption_labels(self):
        from txt2vid_tpu.eval.classifier import caption_labels
        assert caption_labels("digit 7 is left and right.") == (7, 0)
        assert caption_labels("Digit 0 is bottom and top.") == (0, 3)
        assert caption_labels("digit 3 is top and bottom") == (3, 2)
        assert caption_labels("a cat is cooking.") is None

    def test_feature_space_is_resolution_agnostic(self, tmp_path):
        # save random-init weights, then score videos at two different
        # resolutions/frame-counts through the SAME frozen feature space
        import flax.serialization
        import jax
        from txt2vid_tpu.eval import classifier as C

        model = C._build_model()
        params = model.init(jax.random.key(0),
                            np.zeros((1, 16, 32, 32, 1), np.float32))
        p = tmp_path / "cls.msgpack"
        params16 = jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float16), params)
        p.write_bytes(flax.serialization.to_bytes(params16))
        loaded = C.load_frozen(p)

        rng = np.random.default_rng(0)
        small = rng.uniform(-1, 1, (4, 16, 32, 32, 1)).astype(np.float32)
        big = rng.uniform(-1, 1, (4, 32, 128, 128, 1)).astype(np.float32)
        rgb = rng.uniform(-1, 1, (4, 8, 64, 64, 3)).astype(np.float32)
        for v in (small, big, rgb):
            f = C.classifier_features(v, params=loaded)
            assert f.shape == (4, 128)
            assert np.isfinite(f).all()

    def test_classifier_fid_separates(self, tmp_path):
        import flax.serialization
        import jax
        from txt2vid_tpu.eval import classifier as C

        model = C._build_model()
        params = model.init(jax.random.key(1),
                            np.zeros((1, 16, 32, 32, 1), np.float32))
        rng = np.random.default_rng(3)
        real = rng.standard_normal((16, 8, 32, 32, 1)).astype(np.float32).clip(-1, 1)
        close = (real + 0.01 * rng.standard_normal(real.shape)).astype(np.float32)
        far = rng.uniform(0.5, 1, real.shape).astype(np.float32)
        near_fid = C.classifier_fid(real, close, params=params)
        far_fid = C.classifier_fid(real, far, params=params)
        assert far_fid > near_fid
