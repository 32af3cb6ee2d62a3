"""Golden tests for the loss zoo (reference txt2vid/gan/losses.py formulas are the
spec; see README.md:15-24 pairing table) and the gradient penalty."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from txt2vid_tpu.gan import losses as L


def bce(x, y):
    # sigmoid BCE with logits, mean-reduced
    return float(np.mean(np.maximum(x, 0) - x * y + np.log1p(np.exp(-np.abs(x)))))


FAKE = jnp.array([0.5, -1.0, 2.0])
REAL = jnp.array([1.5, 0.3, -0.7])
F, R = np.asarray(FAKE), np.asarray(REAL)


class TestLossZoo:
    def test_vanilla(self):
        loss = L.VanillaGanLoss()
        assert float(loss.discrim_loss(fake=FAKE, real=REAL)) == pytest.approx(
            bce(F, 0) + bce(R, 1), rel=1e-5)
        assert float(loss.gen_loss(fake=FAKE)) == pytest.approx(bce(F, 1), rel=1e-5)

    def test_hinge(self):
        loss = L.HingeGanLoss()
        # reference-effective semantics (see losses.py docstring)
        assert float(loss.discrim_loss(fake=FAKE, real=REAL)) == pytest.approx(
            np.mean(np.maximum(0, 2 - R)) + np.mean(F), rel=1e-5)
        assert float(loss.gen_loss(fake=FAKE)) == pytest.approx(
            np.mean(np.maximum(0, 2 - F)), rel=1e-5)

    def test_wasserstein(self):
        loss = L.WassersteinGanLoss()
        assert float(loss.discrim_loss(fake=FAKE, real=REAL)) == pytest.approx(
            -(R.mean() - F.mean()), rel=1e-5)
        assert float(loss.gen_loss(fake=FAKE)) == pytest.approx(-F.mean(), rel=1e-5)

    def test_rsgan(self):
        # reference losses.py:79-85: D = BCE(real - fake, 1); G = BCE(fake - real, 1)
        loss = L.RSGANLoss()
        assert float(loss.discrim_loss(fake=FAKE, real=REAL)) == pytest.approx(
            bce(R - F, 1), rel=1e-5)
        assert float(loss.gen_loss(fake=FAKE, real=REAL)) == pytest.approx(
            bce(F - R, 1), rel=1e-5)

    def test_rasgan(self):
        # reference losses.py:94-110 with the fake_labels typo fixed
        loss = L.RaSGANLoss()
        expected_d = (bce(R - F.mean(), 1) + bce(F - R.mean(), 0)) / 2
        expected_g = (bce(R - F.mean(), 0) + bce(F - R.mean(), 1)) / 2
        assert float(loss.discrim_loss(fake=FAKE, real=REAL)) == pytest.approx(expected_d, rel=1e-5)
        assert float(loss.gen_loss(fake=FAKE, real=REAL)) == pytest.approx(expected_g, rel=1e-5)

    def test_ralsgan(self):
        # reference losses.py:117-133
        loss = L.RaLSGANLoss()
        expected_d = (np.mean((R - F.mean() - 1) ** 2) + np.mean((F - R.mean() + 1) ** 2)) / 2
        expected_g = (np.mean((R - F.mean() + 1) ** 2) + np.mean((F - R.mean() - 1) ** 2)) / 2
        assert float(loss.discrim_loss(fake=FAKE, real=REAL)) == pytest.approx(expected_d, rel=1e-5)
        assert float(loss.gen_loss(fake=FAKE, real=REAL)) == pytest.approx(expected_g, rel=1e-5)

    def test_mixed(self):
        loss = L.MixedGanLoss(g_loss=L.WassersteinGanLoss(), d_loss=L.RSGANLoss())
        assert float(loss.gen_loss(fake=FAKE, real=REAL)) == pytest.approx(-F.mean(), rel=1e-5)
        assert float(loss.discrim_loss(fake=FAKE, real=REAL)) == pytest.approx(
            bce(R - F, 1), rel=1e-5)


class TestGradientPenalty:
    def test_linear_critic_norm(self):
        # D(x) = sum(w * x): grad wrt x is w everywhere, so GP = (||w|| - 1)^2
        w = jnp.array([[0.5, 1.0], [2.0, -1.0]]).reshape(1, 2, 2, 1)

        def d_fn(x, cond, xbar):
            return jnp.sum(x * w, axis=(1, 2, 3)), None

        real = jnp.ones((4, 2, 2, 1))
        fake = jnp.zeros((4, 2, 2, 1))
        gp = L.gradient_penalty(d_fn, jax.random.key(0), real, fake)
        expected = (np.sqrt(0.25 + 1 + 4 + 1) - 1) ** 2
        assert float(gp) == pytest.approx(expected, rel=1e-4)

    def test_zero_center(self):
        w = jnp.array([[1.0, 1.0], [1.0, 1.0]]).reshape(1, 2, 2, 1)

        def d_fn(x, cond, xbar):
            return jnp.sum(x * w, axis=(1, 2, 3)), None

        real = jnp.ones((3, 2, 2, 1))
        fake = jnp.zeros((3, 2, 2, 1))
        gp = L.gradient_penalty(d_fn, jax.random.key(0), real, fake,
                                zero_center=True, combine="sum")
        assert float(gp) == pytest.approx(3 * 4.0, rel=1e-4)  # ||g||^2 = 4 per sample

    def test_multiscale_sums_scales(self):
        def d_fn_for_scale(i):
            def fn(x, cond, xbar):
                return jnp.sum(x, axis=tuple(range(1, x.ndim))), None
            return fn

        reals = [jnp.ones((2, 2, 2, 1)), jnp.ones((2, 4, 4, 1))]
        fakes = [jnp.zeros_like(r) for r in reals]
        gp = L.multiscale_gradient_penalty(d_fn_for_scale, jax.random.key(0), reals, fakes)
        # grad is all-ones: ||g||^2 = n_elements per sample; summed over batch & scales
        assert float(gp) == pytest.approx(2 * 4 + 2 * 16, rel=1e-4)
