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
