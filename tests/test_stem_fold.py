"""Weight-level equivalence of the padding-free C=1 stem (_C1Conv3d).

The folded stem (models/resnet3d.py _C1Conv3d, RESULTS.md round-7 C=1
lane-padding measurement) must be a pure reformulation: identical parameter
pytree (names, shapes, init values) and identical function of those
parameters, for every impl choice — so checkpoints, torch imports
(reference txt2vid/models/resnet3d.py:12-19 stem), and mid-run impl swaps
all interop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from txt2vid_tpu.models.resnet3d import Resnet3D, _C1Conv3d


def _tree_shapes(tree):
    return jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), tree)


def _init_and_apply(impl, x, train=True, **kw):
    model = Resnet3D(mid_ch=16, num_down_blocks=2, with_attn=True,
                     stem_impl=impl, **kw)
    vars_ = model.init(jax.random.key(0), x, train=train)
    out, _ = model.apply(vars_, x, train=train, mutable=["batch_stats"])
    return model, vars_, out


class TestC1StemEquivalence:
    @pytest.fixture(scope="class")
    def x(self):
        rng = np.random.default_rng(3)
        return jnp.asarray(rng.standard_normal((2, 4, 16, 16, 1)), jnp.float32)

    @pytest.mark.parametrize("impl", ["einsum", "shift"])
    def test_param_tree_and_init_identical(self, x, impl):
        _, v_conv, _ = _init_and_apply("conv", x)
        _, v_alt, _ = _init_and_apply(impl, x)
        assert _tree_shapes(v_conv) == _tree_shapes(v_alt)
        leaves_c = jax.tree_util.tree_leaves(v_conv)
        leaves_a = jax.tree_util.tree_leaves(v_alt)
        for c, a in zip(leaves_c, leaves_a):
            np.testing.assert_array_equal(np.asarray(c), np.asarray(a))

    @pytest.mark.parametrize("impl", ["einsum", "shift"])
    def test_forward_parity_cross_impl_apply(self, x, impl):
        # init under conv, apply under the folded impl — the checkpoint-resume
        # direction the flagship takes
        model_c, v, out_c = _init_and_apply("conv", x)
        model_a = Resnet3D(mid_ch=16, num_down_blocks=2, with_attn=True,
                           stem_impl=impl)
        out_a, _ = model_a.apply(v, x, train=True, mutable=["batch_stats"])
        for a, c in zip(jax.tree_util.tree_leaves(out_a),
                        jax.tree_util.tree_leaves(out_c)):
            if a is None:
                assert c is None
                continue
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=2e-4, atol=2e-5)

    @pytest.mark.parametrize("impl", ["einsum", "shift"])
    def test_grad_parity(self, x, impl):
        def make_loss(impl):
            model = Resnet3D(mid_ch=16, num_down_blocks=2, with_attn=True,
                             stem_impl=impl)
            v = model.init(jax.random.key(1), x, train=True)

            def loss(params, xx):
                out, _ = model.apply({**v, "params": params}, xx, train=True,
                                     mutable=["batch_stats"])
                return jnp.mean(out[0] ** 2) + jnp.mean(out[2] ** 2)
            return v["params"], loss

        p, loss_c = make_loss("conv")
        _, loss_a = make_loss(impl)
        gc_p, gc_x = jax.grad(loss_c, argnums=(0, 1))(p, x)
        ga_p, ga_x = jax.grad(loss_a, argnums=(0, 1))(p, x)
        for a, c in zip(jax.tree_util.tree_leaves(ga_p),
                        jax.tree_util.tree_leaves(gc_p)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=5e-4, atol=5e-5)
        np.testing.assert_allclose(np.asarray(ga_x), np.asarray(gc_x),
                                   rtol=5e-4, atol=5e-5)

    def test_multichannel_falls_back_to_conv(self):
        rng = np.random.default_rng(5)
        x3 = jnp.asarray(rng.standard_normal((2, 4, 16, 16, 3)), jnp.float32)
        model = Resnet3D(mid_ch=16, num_down_blocks=2, with_attn=False,
                         stem_impl="einsum")
        v = model.init(jax.random.key(0), x3, train=True)
        assert v["params"]["stem_conv1"]["kernel"].shape == (3, 3, 3, 3, 16)
        out, _ = model.apply(v, x3, train=True, mutable=["batch_stats"])
        assert np.isfinite(np.asarray(out[0])).all()

    def test_unit_conv_parity_bf16(self):
        # the flagship bf16 path promotes input+kernel to bf16; parity must
        # hold there too (looser tolerance: bf16 summation order differs)
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((2, 4, 8, 8, 1)), jnp.float32)
        for impl in ("einsum", "shift"):
            m_ref = _C1Conv3d(8, (3, 3, 3), impl="conv", dtype=jnp.bfloat16)
            v = m_ref.init(jax.random.key(2), x)
            y_ref = m_ref.apply(v, x)
            y = _C1Conv3d(8, (3, 3, 3), impl=impl,
                          dtype=jnp.bfloat16).apply(v, x)
            assert y.dtype == y_ref.dtype == jnp.bfloat16
            np.testing.assert_allclose(
                np.asarray(y, np.float32), np.asarray(y_ref, np.float32),
                rtol=0.15, atol=0.1)

    def test_skip_1x1_parity(self):
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.standard_normal((2, 3, 8, 8, 1)), jnp.float32)
        m_ref = _C1Conv3d(8, (1, 1, 1), impl="conv")
        v = m_ref.init(jax.random.key(4), x)
        y_ref = m_ref.apply(v, x)
        for impl in ("einsum", "shift"):
            y = _C1Conv3d(8, (1, 1, 1), impl=impl).apply(v, x)
            np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                       rtol=1e-5, atol=1e-6)
