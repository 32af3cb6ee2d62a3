"""Unit tests for ops: pooling, subsample, initializers, attention core."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from txt2vid_tpu.ops.pooling import (
    avg_pool_3d_shape_aware, max_pool_2d, max_pool_3d, upsample_nearest_2d)
from txt2vid_tpu.ops.subsample import subsample_video, multiscale_pyramid
from txt2vid_tpu.ops.attention import attention_core
from txt2vid_tpu.ops.initializers import make_kernel_init


class TestPooling:
    def test_avg_pool_shape_aware_even(self):
        x = jnp.ones((2, 16, 8, 8, 3))
        y = avg_pool_3d_shape_aware(x)
        assert y.shape == (2, 8, 4, 4, 3)
        np.testing.assert_allclose(y, 1.0, rtol=1e-6)

    def test_avg_pool_skips_size_one_dims(self):
        # reference DownSample only pools dims > 1 (models/layers.py:207-215)
        x = jnp.ones((2, 1, 4, 4, 3))
        y = avg_pool_3d_shape_aware(x)
        assert y.shape == (2, 1, 2, 2, 3)

    def test_avg_pool_odd_dim_pads(self):
        # odd dims pad by 1 both sides, zeros included in the mean (torch
        # count_include_pad=True)
        x = jnp.ones((1, 1, 5, 4, 1))
        y = avg_pool_3d_shape_aware(x)
        assert y.shape == (1, 1, 3, 2, 1)
        # first output row covers pad+row0 => mean = 2/4
        np.testing.assert_allclose(y[0, 0, 0, 0, 0], 0.5, rtol=1e-6)

    def test_max_pool(self):
        x = jnp.arange(16.0).reshape(1, 4, 4, 1)
        y = max_pool_2d(x)
        assert y.shape == (1, 2, 2, 1)
        assert float(y[0, 0, 0, 0]) == 5.0

        v = jnp.ones((1, 4, 4, 4, 2))
        assert max_pool_3d(v).shape == (1, 4, 2, 2, 2)

    def test_upsample_nearest(self):
        x = jnp.array([[1.0, 2.0], [3.0, 4.0]]).reshape(1, 2, 2, 1)
        y = upsample_nearest_2d(x)
        assert y.shape == (1, 4, 4, 1)
        assert float(y[0, 0, 1, 0]) == 1.0
        assert float(y[0, 3, 3, 0]) == 4.0


class TestSubsample:
    def test_shapes_and_phase(self):
        x = jnp.arange(4 * 8 * 2 * 2 * 1.0).reshape(4, 8, 2, 2, 1)
        y, bt = subsample_video(x, jax.random.key(0))
        assert y.shape == (2, 4, 2, 2, 1)
        # batch rows are x[0], x[2]; frames start at bt with stride 2
        np.testing.assert_allclose(np.asarray(y[0, 0]), np.asarray(x[0, int(bt)]))
        np.testing.assert_allclose(np.asarray(y[1, 1]), np.asarray(x[2, int(bt) + 2]))

    def test_phase_varies(self):
        x = jnp.zeros((2, 4, 1, 1, 1))
        phases = {int(subsample_video(x, jax.random.key(s))[1]) for s in range(20)}
        assert phases == {0, 1}

    def test_multiscale_pyramid(self):
        x = jnp.ones((8, 16, 64, 64, 3))
        cond = jnp.ones((8, 5))
        xs, conds = multiscale_pyramid(x, cond, [8, 16, 32, 64], jax.random.key(0),
                                       subsample_input=True)
        assert [a.shape for a in xs] == [
            (8, 16, 8, 8, 3), (4, 8, 16, 16, 3), (2, 4, 32, 32, 3), (1, 2, 64, 64, 3)]
        assert [c.shape[0] for c in conds] == [8, 4, 2, 1]

    def test_multiscale_no_subsample(self):
        x = jnp.ones((4, 16, 32, 32, 3))
        xs, conds = multiscale_pyramid(x, None, [16, 32], jax.random.key(0),
                                       subsample_input=False)
        assert [a.shape for a in xs] == [(4, 16, 16, 16, 3), (4, 16, 32, 32, 3)]
        assert conds is None


class TestAttention:
    def test_matches_explicit_softmax(self):
        k = jax.random.key(0)
        kt, kp, kg = jax.random.split(k, 3)
        theta = jax.random.normal(kt, (2, 16, 4))
        phi = jax.random.normal(kp, (2, 8, 4))
        g = jax.random.normal(kg, (2, 8, 6))
        o = attention_core(theta, phi, g)
        beta = jax.nn.softmax(jnp.einsum("bnd,bmd->bnm", theta, phi), axis=-1)
        expected = jnp.einsum("bnm,bmv->bnv", beta, g)
        np.testing.assert_allclose(np.asarray(o), np.asarray(expected), atol=1e-5)


class TestInitializers:
    def test_xavier_std(self):
        init = make_kernel_init("xavier")
        w = init(jax.random.key(0), (256, 512))
        expected = np.sqrt(2.0 / (256 + 512))
        assert abs(float(w.std()) - expected) / expected < 0.05

    def test_xavier_gain(self):
        init = make_kernel_init("xavier", np.sqrt(2.0))
        w = init(jax.random.key(0), (256, 512))
        expected = np.sqrt(2.0) * np.sqrt(2.0 / (256 + 512))
        assert abs(float(w.std()) - expected) / expected < 0.05

    def test_normal(self):
        init = make_kernel_init("normal")
        w = init(jax.random.key(0), (512, 512))
        assert abs(float(w.std()) - 0.02) < 0.002

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            make_kernel_init("nope")


class TestPallasInterpret:
    """The fused kernel's semantics, validated on CPU via Pallas interpret mode
    (the compiled kernel itself is validated on hardware by tpu_checks.py)."""

    def test_fused_matches_core(self):
        from txt2vid_tpu.ops.pallas_attention import fused_attention
        k = jax.random.key(3)
        kt, kp, kg = jax.random.split(k, 3)
        theta = jax.random.normal(kt, (2, 64, 8))
        phi = jax.random.normal(kp, (2, 16, 8))
        g = jax.random.normal(kg, (2, 16, 12))
        ref = attention_core(theta, phi, g)
        out = fused_attention(theta, phi, g, block_n=32, block_m=8, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_online_softmax_multi_block(self):
        from txt2vid_tpu.ops.pallas_attention import fused_attention
        # many M blocks exercise the running-max/sum carry
        k = jax.random.key(4)
        kt, kp, kg = jax.random.split(k, 3)
        theta = jax.random.normal(kt, (1, 16, 4)) * 4  # large logits stress stability
        phi = jax.random.normal(kp, (1, 32, 4)) * 4
        g = jax.random.normal(kg, (1, 32, 8))
        ref = attention_core(theta, phi, g)
        out = fused_attention(theta, phi, g, block_n=8, block_m=4, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_lse_output(self):
        from txt2vid_tpu.ops.pallas_attention import fused_attention
        k = jax.random.key(5)
        kt, kp, kg = jax.random.split(k, 3)
        theta = jax.random.normal(kt, (2, 32, 4))
        phi = jax.random.normal(kp, (2, 16, 4))
        g = jax.random.normal(kg, (2, 16, 8))
        _, lse = fused_attention(theta, phi, g, block_n=16, block_m=8,
                                 interpret=True, return_lse=True)
        logits = jnp.einsum("bnd,bmd->bnm", theta, phi)
        ref = jax.scipy.special.logsumexp(logits, axis=-1)
        np.testing.assert_allclose(np.asarray(lse), np.asarray(ref), atol=1e-5)

    def test_flash_backward_matches_xla_vjp(self):
        """The Pallas backward kernels (dtheta / dphi / dg from saved lse) must
        match jax.vjp through the XLA reference — training through the fused
        kernel never materializes the (N, M) map in HBM."""
        from txt2vid_tpu.ops.pallas_attention import (fused_attention,
                                                      fused_attention_bwd)
        k = jax.random.key(6)
        kt, kp, kg, ko = jax.random.split(k, 4)
        theta = jax.random.normal(kt, (2, 64, 8))
        phi = jax.random.normal(kp, (2, 32, 8))
        g = jax.random.normal(kg, (2, 32, 12))
        do = jax.random.normal(ko, (2, 64, 12))

        o, lse = fused_attention(theta, phi, g, block_n=16, block_m=8,
                                 interpret=True, return_lse=True)
        dt, dp, dg = fused_attention_bwd(theta, phi, g, o, lse, do,
                                         block_n=16, block_m=8, interpret=True)
        _, vjp = jax.vjp(attention_core, theta, phi, g)
        rt, rp, rg = vjp(do)
        np.testing.assert_allclose(np.asarray(dt), np.asarray(rt), atol=2e-4)
        np.testing.assert_allclose(np.asarray(dp), np.asarray(rp), atol=2e-4)
        np.testing.assert_allclose(np.asarray(dg), np.asarray(rg), atol=2e-4)

    def test_custom_vjp_end_to_end(self):
        """jax.grad through attention_core_fused (interpret mode) vs the XLA path."""
        from txt2vid_tpu.ops import attention as A
        k = jax.random.key(7)
        kt, kp, kg = jax.random.split(k, 3)
        theta = jax.random.normal(kt, (1, 32, 4))
        phi = jax.random.normal(kp, (1, 16, 4))
        g = jax.random.normal(kg, (1, 16, 8))

        def loss(fn, t, p, gg):
            return jnp.sum(jnp.tanh(fn(t, p, gg)))

        prev = A.INTERPRET
        A.INTERPRET = True
        try:
            gf = jax.grad(lambda *a: loss(A.attention_core_fused, *a),
                          argnums=(0, 1, 2))(theta, phi, g)
        finally:
            A.INTERPRET = prev
        gr = jax.grad(lambda *a: loss(attention_core, *a),
                      argnums=(0, 1, 2))(theta, phi, g)
        for a, c in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-5)


class TestNoPallasOverride:
    def test_context_forces_xla_path(self):
        from txt2vid_tpu.ops import attention as A

        calls = []
        orig = A.attention_core_fused
        try:
            A.attention_core_fused = lambda *a: calls.append("pallas") or orig(*a)
            theta = jnp.ones((1, 8, 4)); phi = jnp.ones((1, 4, 4)); g = jnp.ones((1, 4, 4))
            with A.no_pallas():
                A.attention_core_auto(theta, phi, g, use_pallas=True)
            assert calls == []  # fused path not taken under no_pallas
        finally:
            A.attention_core_fused = orig

    def test_flag_restored_after_exception(self):
        from txt2vid_tpu.ops import attention as A
        try:
            with A.no_pallas():
                assert A._PALLAS_DISABLED
                raise RuntimeError("boom")
        except RuntimeError:
            pass
        assert not A._PALLAS_DISABLED


class TestAdamStorage:
    def test_matches_optax_adam_in_f32(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        import optax

        from txt2vid_tpu.ops.optim import adam_storage

        params = {"w": jnp.asarray(np.random.default_rng(0)
                                   .standard_normal((8, 8)), jnp.float32)}
        ref = optax.adam(1e-3, b1=0.5, b2=0.99)
        mine = adam_storage(1e-3, b1=0.5, b2=0.99)
        s_ref, s_mine = ref.init(params), mine.init(params)
        p_ref = p_mine = params
        for i in range(5):
            g = {"w": jnp.asarray(np.random.default_rng(i + 1)
                                  .standard_normal((8, 8)), jnp.float32)}
            u_ref, s_ref = ref.update(g, s_ref, p_ref)
            u_mine, s_mine = mine.update(g, s_mine, p_mine)
            p_ref = optax.apply_updates(p_ref, u_ref)
            p_mine = optax.apply_updates(p_mine, u_mine)
        np.testing.assert_allclose(np.asarray(p_mine["w"]),
                                   np.asarray(p_ref["w"]), rtol=1e-5, atol=1e-7)

    def test_bf16_moments_store_and_track(self):
        import jax.numpy as jnp
        import numpy as np
        import optax

        from txt2vid_tpu.ops.optim import adam_storage

        params = {"w": jnp.ones((16,), jnp.float32)}
        opt = adam_storage(1e-2, mu_dtype=jnp.bfloat16, nu_dtype=jnp.bfloat16)
        s = opt.init(params)
        assert s[0].mu["w"].dtype == jnp.bfloat16
        assert s[0].nu["w"].dtype == jnp.bfloat16
        ref = optax.adam(1e-2)
        s_ref = ref.init(params)
        p, p_ref = params, params
        for i in range(20):
            g = {"w": jnp.full((16,), 0.1 * ((i % 3) - 1), jnp.float32)}
            u, s = opt.update(g, s, p)
            p = optax.apply_updates(p, u)
            u_ref, s_ref = ref.update(g, s_ref, p_ref)
            p_ref = optax.apply_updates(p_ref, u_ref)
        # bf16 moment storage tracks f32 Adam to ~1% relative
        np.testing.assert_allclose(np.asarray(p["w"]), np.asarray(p_ref["w"]),
                                   rtol=2e-2, atol=2e-3)
