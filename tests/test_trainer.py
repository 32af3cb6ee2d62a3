"""Host-loop smoke test: trainer.train() end-to-end at tiny sizes — telemetry,
checkpoint cadence with loss-encoded names, sample grid dumps, restore round-trip."""

import os
import types

import jax
import jax.numpy as jnp
import numpy as np
from pathlib import Path
import optax

from txt2vid_tpu.gan import losses as L, trainer
from txt2vid_tpu.gan.cond_gan import CondGan
from txt2vid_tpu.gan.train_step import TrainConfig, build_train_step, init_state
from txt2vid_tpu.models import tganv2
from txt2vid_tpu.utils.checkpoint import latest_checkpoint, restore_state


class FakeLoader:
    def __init__(self, batch, n):
        self.batch = batch
        self.n = n

    def __iter__(self):
        for _ in range(self.n):
            yield self.batch

    def __len__(self):
        return self.n


def test_train_loop_and_restore(tmp_path):
    gen = tganv2.MultiScaleGen(latent_size=8, width=16, height=16, num_channels=1,
                               fm_channels=8, additional_blocks=(8,), num_frames=4,
                               use_pallas=False)
    discrim = tganv2.MultiScaleDiscrim(discrim_down_blocks=(1, 1), num_channels=1,
                                       with_attn=False, use_pallas=False)
    gan = CondGan(gen=gen, discrims=[discrim])
    cfg = TrainConfig(frame_sizes=(8, 16), subsample_input=True, latent_size=8)
    optG = optax.adam(2e-4, b1=0.5)
    optD = optax.adam(2e-4, b1=0.5)
    batch = {"video": jnp.zeros((4, 4, 16, 16, 1))}

    state = init_state(gan, jax.random.key(0), batch, optG, optD, cfg)
    step = jax.jit(build_train_step(gan, L.RSGANLoss(), optG, optD, cfg))

    params = types.SimpleNamespace(
        out=str(tmp_path / "out"), out_samples=str(tmp_path / "samples"),
        log_period=2, loss_window_size=5, save_initial=False,
        save_initial_examples=False, save_model_period=3, save_example_period=3,
        sample_batch_size=2, seed=0)

    final = trainer.train(gan=gan, state=state, train_step=step, num_epoch=1,
                          dataset=FakeLoader(batch, 4), params=params, seed=0)
    assert int(final.step) == 4

    # checkpoint written with loss-encoded name and restorable
    ckpt = latest_checkpoint(params.out)
    # periodic checkpoint at iter_3 plus the end-of-training save at iter_4
    assert ckpt is not None and "iter_4" in ckpt
    assert any("iter_3" in str(c) for c in Path(params.out).iterdir())
    restored = restore_state(jax.device_get(state), ckpt)
    assert int(restored.step) == 4

    # sample dumps exist
    files = os.listdir(params.out_samples)
    assert any(f.startswith("real_samples") for f in files)
    assert any(f.startswith("fake_samples") for f in files)

    # grid renderer sanity
    grid = trainer.to_grid(np.zeros((2, 3, 8, 8, 1), np.float32))
    assert grid.shape == (2 * 10 + 2, 3 * 10 + 2, 1)
    assert grid[2, 2, 0] == 127  # -1..1 zero maps to mid-gray


def test_train_loop_scanned_steps(tmp_path):
    """steps_per_dispatch=2: one dispatched lax.scan program advances 2
    iterations per loop item; cadence/metrics/checkpoints stay iteration-true."""
    from txt2vid_tpu.parallel.mesh import (
        make_mesh, jit_scanned_train_step_sharded, shard_train_state, replicated,
        prefetch_to_mesh)

    gen = tganv2.MultiScaleGen(latent_size=8, width=16, height=16, num_channels=1,
                               fm_channels=8, additional_blocks=(8,), num_frames=4,
                               use_pallas=False)
    discrim = tganv2.MultiScaleDiscrim(discrim_down_blocks=(1, 1), num_channels=1,
                                       with_attn=False, use_pallas=False)
    gan = CondGan(gen=gen, discrims=[discrim])
    cfg = TrainConfig(frame_sizes=(8, 16), subsample_input=True, latent_size=8)
    optG = optax.adam(2e-4, b1=0.5)
    optD = optax.adam(2e-4, b1=0.5)
    batch = {"video": jnp.zeros((4, 4, 16, 16, 1))}

    state = init_state(gan, jax.random.key(0), batch, optG, optD, cfg)
    mesh = make_mesh(n_devices=1)
    step = jit_scanned_train_step_sharded(
        build_train_step(gan, L.RSGANLoss(), optG, optD, cfg), 2, mesh)
    state = shard_train_state(state, mesh)

    class StackedLoader:
        def __iter__(self):
            return prefetch_to_mesh(
                iter([{"video": np.zeros((4, 4, 16, 16, 1), np.float32)}] * 6),
                mesh, stack=2)

        def __len__(self):
            return 3

    params = types.SimpleNamespace(
        out=str(tmp_path / "out"), out_samples=str(tmp_path / "samples"),
        log_period=2, loss_window_size=5, save_initial=False,
        save_initial_examples=False, save_model_period=4, save_example_period=4,
        sample_batch_size=2, seed=0, steps_per_dispatch=2)

    final = trainer.train(gan=gan, state=state, train_step=step, num_epoch=1,
                          dataset=StackedLoader(), params=params, seed=0)
    assert int(final.step) == 6          # 3 chunks x 2 steps
    ckpt = latest_checkpoint(params.out)
    # period-4 boundary checkpoint plus the end-of-training save at iter_6
    assert ckpt is not None and "iter_6" in ckpt
    assert any("iter_4" in str(c) for c in Path(params.out).iterdir())
    files = os.listdir(params.out_samples)
    assert any(f.startswith("fake_samples") for f in files)
