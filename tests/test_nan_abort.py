"""NaN-abort contract of the host loop (trainer.NanAbort): a poisoned or
frozen run must stop at the next metric drain, BEFORE any poisoned checkpoint
is written — the relaunch harness (scripts/r3_queue18.sh) depends on the
latest checkpoint on disk always predating the event. Motivated by the
queue-13 spike NaN and the queue-16 silently-frozen discriminator
(RESULTS.md round 3)."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from pathlib import Path

from txt2vid_tpu.gan import losses as L, trainer
from txt2vid_tpu.gan.cond_gan import CondGan
from txt2vid_tpu.gan.train_step import TrainConfig, init_state
from txt2vid_tpu.models import tganv2
from txt2vid_tpu.utils.checkpoint import latest_checkpoint


class FakeLoader:
    def __init__(self, batch, n):
        self.batch, self.n = batch, n

    def __iter__(self):
        for _ in range(self.n):
            yield self.batch

    def __len__(self):
        return self.n


def _tiny_state():
    gen = tganv2.MultiScaleGen(latent_size=8, width=16, height=16,
                               num_channels=1, fm_channels=8,
                               additional_blocks=(8,), num_frames=4,
                               use_pallas=False)
    discrim = tganv2.MultiScaleDiscrim(discrim_down_blocks=(1, 1),
                                       num_channels=1, with_attn=False,
                                       use_pallas=False)
    gan = CondGan(gen=gen, discrims=[discrim])
    cfg = TrainConfig(frame_sizes=(8, 16), subsample_input=True, latent_size=8)
    batch = {"video": jnp.zeros((2, 4, 16, 16, 1))}
    state = init_state(gan, jax.random.key(0), batch,
                       optax.adam(2e-4), optax.adam(2e-4), cfg)
    return gan, state, batch


def _fake_step(metrics_for_iter):
    """Host-side stand-in for the compiled step: advances state.step and
    returns scripted metrics keyed by the 1-based iteration."""
    def step(state, batch, key):
        it = int(state.step) + 1
        return state.replace(step=state.step + 1), metrics_for_iter(it)
    return step


def _params(tmp_path, **kw):
    base = dict(out=str(tmp_path / "out"),
                out_samples=str(tmp_path / "samples"),
                log_period=2, loss_window_size=5, save_initial=False,
                save_initial_examples=False, save_model_period=3,
                save_example_period=10 ** 6, sample_batch_size=2, seed=0)
    base.update(kw)
    return types.SimpleNamespace(**base)


def test_loss_nan_aborts_before_poisoned_checkpoint(tmp_path):
    gan, state, batch = _tiny_state()
    step = _fake_step(lambda it: {
        "loss_d": np.float32(np.nan if it >= 4 else 0.5),
        "loss_g": np.float32(0.5),
        "grad_norm_d": np.float32(1.0), "grad_norm_g": np.float32(1.0)})
    params = _params(tmp_path)
    with pytest.raises(trainer.NanAbort) as exc:
        trainer.train(gan=gan, state=state, train_step=step, num_epoch=1,
                      dataset=FakeLoader(batch, 8), params=params, seed=0)
    assert exc.value.iteration == 4
    # the iter-3 periodic checkpoint (healthy) exists; nothing newer does
    ckpt = latest_checkpoint(params.out)
    assert ckpt is not None and "iter_3" in ckpt
    assert not any("iter_6" in str(c) or "iter_8" in str(c)
                   for c in Path(params.out).iterdir())


def test_unclipped_nonfinite_gnorm_aborts(tmp_path):
    gan, state, batch = _tiny_state()
    step = _fake_step(lambda it: {
        "loss_d": np.float32(0.5), "loss_g": np.float32(0.5),
        "grad_norm_d": np.float32(np.inf if it >= 5 else 1.0),
        "grad_norm_g": np.float32(1.0)})
    params = _params(tmp_path)  # no clip_grad attr -> unclipped
    with pytest.raises(trainer.NanAbort) as exc:
        trainer.train(gan=gan, state=state, train_step=step, num_epoch=1,
                      dataset=FakeLoader(batch, 8), params=params, seed=0)
    assert exc.value.iteration == 5


def test_clipped_streak_aborts_frozen_phase(tmp_path):
    # with the clip guard on, isolated non-finite norms are survivable (the
    # guard zeroes that update) — but an unbroken streak means the phase is
    # frozen (queue-16) and must abort
    gan, state, batch = _tiny_state()
    step = _fake_step(lambda it: {
        "loss_d": np.float32(0.5), "loss_g": np.float32(0.5),
        "grad_norm_d": np.float32(np.nan), "grad_norm_g": np.float32(1.0)})
    params = _params(tmp_path, clip_grad=50.0, nan_abort_streak=4)
    with pytest.raises(trainer.NanAbort) as exc:
        trainer.train(gan=gan, state=state, train_step=step, num_epoch=1,
                      dataset=FakeLoader(batch, 8), params=params, seed=0)
    assert exc.value.iteration == 4
    assert "frozen" in exc.value.what


def test_clipped_isolated_nonfinite_survives(tmp_path):
    gan, state, batch = _tiny_state()
    step = _fake_step(lambda it: {
        "loss_d": np.float32(0.5), "loss_g": np.float32(0.5),
        "grad_norm_d": np.float32(np.nan if it % 3 == 0 else 1.0),
        "grad_norm_g": np.float32(1.0)})
    params = _params(tmp_path, clip_grad=50.0, nan_abort_streak=4)
    final = trainer.train(gan=gan, state=state, train_step=step, num_epoch=1,
                          dataset=FakeLoader(batch, 8), params=params, seed=0)
    assert int(final.step) == 8


def test_clipped_windowed_rate_aborts_lazy_gp_lockin(tmp_path):
    # --gp_every 4 lock-in signature: every 4th step's grad norm is non-finite
    # (the GP steps), so the CONSECUTIVE streak never exceeds 1 and the streak
    # detector is blind — the windowed rate detector must fire instead
    gan, state, batch = _tiny_state()
    step = _fake_step(lambda it: {
        "loss_d": np.float32(0.5), "loss_g": np.float32(0.5),
        "grad_norm_d": np.float32(np.nan if it % 4 == 0 else 1.0),
        "grad_norm_g": np.float32(1.0)})
    params = _params(tmp_path, clip_grad=50.0, nan_abort_streak=4,
                     nan_abort_window=16, nan_abort_window_count=4)
    with pytest.raises(trainer.NanAbort) as exc:
        trainer.train(gan=gan, state=state, train_step=step, num_epoch=1,
                      dataset=FakeLoader(batch, 20), params=params, seed=0)
    assert exc.value.iteration == 16  # events at 4/8/12/16 inside window 16
    assert "within the last" in exc.value.what


def test_burst_guard_skips_midonset_checkpoint(tmp_path):
    # a non-finite burst in progress (>=3 events in the trailing 100 steps,
    # below the abort threshold) must NOT be checkpointed: take-6's
    # iter_11000 was written mid-onset and poisoned the rollback trail
    gan, state, batch = _tiny_state()
    step = _fake_step(lambda it: {
        "loss_d": np.float32(0.5), "loss_g": np.float32(0.5),
        "grad_norm_d": np.float32(np.nan if it in (4, 8, 12) else 1.0),
        "grad_norm_g": np.float32(1.0)})
    params = _params(tmp_path, clip_grad=50.0, save_model_period=6,
                     nan_abort_window=200, nan_abort_window_count=50)
    final = trainer.train(gan=gan, state=state, train_step=step, num_epoch=1,
                          dataset=FakeLoader(batch, 12), params=params, seed=0)
    assert int(final.step) == 12
    ckpt = latest_checkpoint(params.out)
    # iter_6 saved (1 recent event); iter_12 skipped (3 events in window)
    assert ckpt is not None and "iter_6" in ckpt


def test_no_nan_abort_flag_disables(tmp_path):
    gan, state, batch = _tiny_state()
    step = _fake_step(lambda it: {
        "loss_d": np.float32(np.nan), "loss_g": np.float32(0.5),
        "grad_norm_d": np.float32(1.0), "grad_norm_g": np.float32(1.0)})
    params = _params(tmp_path, nan_abort=False)
    final = trainer.train(gan=gan, state=state, train_step=step, num_epoch=1,
                          dataset=FakeLoader(batch, 8), params=params, seed=0)
    assert int(final.step) == 8
