"""Generator-params EMA (gan/ema.py, --g_ema): update math, trainer wiring,
sibling-file checkpointing, restore, and the sample-time swap.

The reference has no EMA (its sampler always used the live generator,
reference gan/trainer.py:44-90); this is a capability extension, kept OUTSIDE
the compiled train step (see gan/ema.py for why)."""

import os
import types
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from txt2vid_tpu.gan import ema as ema_mod
from txt2vid_tpu.gan import losses as L, trainer
from txt2vid_tpu.gan.cond_gan import CondGan
from txt2vid_tpu.gan.train_step import TrainConfig, build_train_step, init_state
from txt2vid_tpu.models import tganv2
from txt2vid_tpu.utils.checkpoint import latest_checkpoint, restore_state


def test_ema_update_math():
    """ema <- ema + (1 - decay**k)(p - ema), leaf-wise, donation-safe."""
    ema = {"a": jnp.ones((3,)), "b": jnp.zeros((2, 2))}
    params = {"a": jnp.full((3,), 3.0), "b": jnp.full((2, 2), 2.0)}
    up = ema_mod.make_ema_update(0.9)
    out = up(ema, params)
    np.testing.assert_allclose(out["a"], 1.0 + 0.1 * 2.0, rtol=1e-6)
    np.testing.assert_allclose(out["b"], 0.2, rtol=1e-6)
    # repeated updates converge geometrically toward params
    for _ in range(4):
        out = up(out, params)
    np.testing.assert_allclose(out["a"], 3.0 - 2.0 * 0.9 ** 5, rtol=1e-5)

    # k-step dispatch uses decay**k (endpoint approximation)
    up2 = ema_mod.make_ema_update(0.9, steps_per_dispatch=3)
    o2 = up2({"a": jnp.ones(())}, {"a": jnp.full((), 3.0)})
    np.testing.assert_allclose(o2["a"], 1.0 + (1 - 0.9 ** 3) * 2.0, rtol=1e-6)


def test_init_ema_is_a_copy():
    """init_ema must COPY: the live buffers are donated into the next step."""
    p = {"w": jnp.arange(4.0)}
    e = ema_mod.init_ema(p)
    assert e["w"].unsafe_buffer_pointer() != p["w"].unsafe_buffer_pointer()
    np.testing.assert_array_equal(np.asarray(e["w"]), np.asarray(p["w"]))


def _tiny_gan():
    gen = tganv2.MultiScaleGen(latent_size=8, width=16, height=16, num_channels=1,
                               fm_channels=8, additional_blocks=(8,), num_frames=4,
                               use_pallas=False)
    discrim = tganv2.MultiScaleDiscrim(discrim_down_blocks=(1, 1), num_channels=1,
                                       with_attn=False, use_pallas=False)
    gan = CondGan(gen=gen, discrims=[discrim])
    cfg = TrainConfig(frame_sizes=(8, 16), subsample_input=True, latent_size=8)
    return gan, cfg


class FakeLoader:
    def __init__(self, batch, n):
        self.batch, self.n = batch, n

    def __iter__(self):
        for _ in range(self.n):
            yield self.batch

    def __len__(self):
        return self.n


def _params(tmp_path, **over):
    base = dict(out=str(tmp_path / "out"), out_samples=str(tmp_path / "samples"),
                log_period=0, loss_window_size=5, save_initial=False,
                save_initial_examples=False, save_model_period=2,
                save_example_period=2, sample_batch_size=2, seed=0)
    base.update(over)
    return types.SimpleNamespace(**base)


def test_train_loop_with_ema(tmp_path):
    """One step at decay 0.5: the saved sibling .ema must equal exactly
    0.5*init + 0.5*params_after_step, and EMA sample grids are written."""
    gan, cfg = _tiny_gan()
    optG = optax.adam(2e-3, b1=0.5)
    optD = optax.adam(2e-3, b1=0.5)
    batch = {"video": jnp.zeros((4, 4, 16, 16, 1))}
    state = init_state(gan, jax.random.key(0), batch, optG, optD, cfg)
    init_params = jax.device_get(state.g_vars["params"])
    step = jax.jit(build_train_step(gan, L.RSGANLoss(), optG, optD, cfg))

    params = _params(tmp_path, g_ema=0.5, save_model_period=1,
                     save_example_period=1)
    final = trainer.train(gan=gan, state=state, train_step=step, num_epoch=1,
                          dataset=FakeLoader(batch, 1), params=params, seed=0)

    ckpt = latest_checkpoint(params.out)
    assert ckpt is not None and os.path.exists(ckpt + ".ema"), \
        "no sibling .ema next to the checkpoint"
    loaded = ema_mod.load_ema(ckpt, init_params)
    expect = jax.tree_util.tree_map(
        lambda i, p: 0.5 * np.asarray(i, np.float64) + 0.5 * np.asarray(p, np.float64),
        init_params, jax.device_get(final.g_vars["params"]))
    got = jax.tree_util.tree_map(np.asarray, loaded)
    for e, g in zip(jax.tree_util.tree_leaves(expect),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(g, e, rtol=2e-6, atol=1e-7)

    files = os.listdir(params.out_samples)
    assert any(f.startswith("fake_ema_samples") for f in files), \
        "no EMA sample grids written"
    assert any(f.startswith("fake_samples") for f in files)


def test_ema_resume_continues_the_average(tmp_path):
    """Resume path (train/gan.py): restore state + sibling .ema and keep
    averaging — the continued EMA must differ from a restart-from-live-params
    EMA, and load_ema returns None when no sibling exists."""
    gan, cfg = _tiny_gan()
    optG = optax.adam(2e-3, b1=0.5)
    optD = optax.adam(2e-3, b1=0.5)
    batch = {"video": jnp.zeros((4, 4, 16, 16, 1))}
    state = init_state(gan, jax.random.key(0), batch, optG, optD, cfg)
    tmpl = jax.device_get(state.g_vars["params"])
    step = jax.jit(build_train_step(gan, L.RSGANLoss(), optG, optD, cfg))

    params = _params(tmp_path, g_ema=0.9, save_model_period=2,
                     save_example_period=0)
    trainer.train(gan=gan, state=state, train_step=step, num_epoch=1,
                  dataset=FakeLoader(batch, 2), params=params, seed=0)
    ckpt = latest_checkpoint(params.out)
    ema1 = ema_mod.load_ema(ckpt, tmpl)
    assert ema1 is not None

    # continue with the restored EMA
    state2 = restore_state(jax.device_get(state), ckpt)
    final = trainer.train(gan=gan, state=state2, train_step=step, num_epoch=1,
                          dataset=FakeLoader(batch, 2), params=params, seed=1,
                          ema=jax.tree_util.tree_map(jnp.asarray, ema1))
    ckpt2 = latest_checkpoint(params.out)
    assert int(final.step) == 4 and "iter_4" in ckpt2
    ema2 = ema_mod.load_ema(ckpt2, tmpl)

    # the continued average still remembers the run-1 init (decay 0.9 over 4
    # steps keeps ~0.9^4=66% of it); a restarted average would not
    w_init = 0.9 ** 4
    leaves1 = jax.tree_util.tree_leaves(jax.tree_util.tree_map(np.asarray, ema2))
    mix = jax.tree_util.tree_map(
        lambda i, p: w_init * np.asarray(i, np.float64)
        + (1 - w_init) * np.asarray(p, np.float64),
        tmpl, jax.device_get(final.g_vars["params"]))
    # not exact (intermediate iterates differ from the endpoint), but the EMA
    # must sit between init and live params, far from the live params alone
    d_live = sum(float(np.abs(a - b).sum()) for a, b in zip(
        leaves1, jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray,
                                   jax.device_get(final.g_vars["params"])))))
    d_mix = sum(float(np.abs(a - b).sum()) for a, b in zip(
        leaves1, jax.tree_util.tree_leaves(mix)))
    assert d_mix < d_live, "continued EMA ignored the restored average"

    # missing sibling -> None (pre-EMA checkpoints restore cleanly)
    from txt2vid_tpu.utils.checkpoint import save_state
    bare = tmp_path / "bare_ckpt"
    save_state(jax.device_get(state), str(bare))
    assert ema_mod.load_ema(str(bare), tmpl) is None


def test_sample_cli_ema_swap(tmp_path):
    """sample.py --ema must actually sample from the sibling params: an
    all-zeros EMA tree yields a different grid than the live params."""
    import json

    from txt2vid_tpu import sample as sample_cli
    from txt2vid_tpu.utils.checkpoint import save_state

    gan, cfg = _tiny_gan()
    opt = optax.adam(1e-4)
    batch = {"video": jnp.zeros((2, 4, 16, 16, 1))}
    state = init_state(gan, jax.random.key(0), batch, opt, opt, cfg)
    ckpt = tmp_path / "ckpt"
    save_state(state, str(ckpt))
    zeros = jax.tree_util.tree_map(np.zeros_like,
                                   jax.device_get(state.g_vars["params"]))
    ema_mod.save_ema(zeros, str(ckpt))

    gen_spec = json.dumps({
        "class": "txt2vid_tpu.models.tganv2.MultiScaleGen",
        "args": {"latent_size": 8, "width": 16, "height": 16, "num_channels": 1,
                 "fm_channels": 8, "additional_blocks": [8], "num_frames": 4,
                 "use_pallas": False}})
    dis_spec = json.dumps({
        "class": "txt2vid_tpu.models.tganv2.MultiScaleDiscrim",
        "args": {"discrim_down_blocks": [1, 1], "num_channels": 1,
                 "with_attn": False, "use_pallas": False}})

    def run(ema_flag, outdir):
        args = types.SimpleNamespace(
            weights=str(ckpt), G=gen_spec, D=[dis_spec], sent=None, vocab=None,
            dont_use_sent=True, sentences=None, frame_sizes=[8, 16],
            num_frames=4, num_channels=1, num_samples=2,
            out_samples=str(outdir), seed=3, ema=ema_flag, M=None)
        sample_cli.main(args)
        fs = sorted(Path(outdir).iterdir())
        assert fs, "no samples written"
        import numpy as _np
        from PIL import Image
        return _np.asarray(Image.open(fs[0]))

    live = run(False, tmp_path / "live")
    avg = run(True, tmp_path / "avg")
    assert live.shape == avg.shape
    assert not np.array_equal(live, avg), "--ema sampled the live params"
