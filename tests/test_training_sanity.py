"""Training-direction sanity: repeated steps on a fixed batch must move each loss the
right way — D steps reduce the D loss, G steps reduce the G loss (against the
concurrently-updating adversary this is not guaranteed, so we check short horizons
on a tiny model where both phases run)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from txt2vid_tpu.gan import losses as L
from txt2vid_tpu.gan.cond_gan import CondGan
from txt2vid_tpu.gan.train_step import TrainConfig, build_train_step, init_state
from txt2vid_tpu.models import tganv2


def test_losses_move_in_the_right_direction():
    gen = tganv2.MultiScaleGen(latent_size=8, width=16, height=16, num_channels=1,
                               fm_channels=8, additional_blocks=(8,), num_frames=4,
                               use_pallas=False)
    discrim = tganv2.MultiScaleDiscrim(discrim_down_blocks=(1, 1), num_channels=1,
                                       with_attn=False, use_pallas=False)
    gan = CondGan(gen=gen, discrims=[discrim])
    cfg = TrainConfig(frame_sizes=(8, 16), subsample_input=True, latent_size=8)
    # fast lr so direction shows within a few steps
    optG = optax.adam(2e-3, b1=0.5)
    optD = optax.adam(2e-3, b1=0.5)

    rng = np.random.default_rng(0)
    # real data with structure (bright blob) so D has something to learn
    video = np.full((4, 4, 16, 16, 1), -1.0, np.float32)
    video[:, :, 4:12, 4:12] = 1.0
    batch = {"video": jnp.asarray(video)}

    state = init_state(gan, jax.random.key(0), batch, optG, optD, cfg)
    step = jax.jit(build_train_step(gan, L.VanillaGanLoss(), optG, optD, cfg))

    ld, lg = [], []
    key = jax.random.key(1)
    for i in range(12):
        key, k = jax.random.split(key)
        state, m = step(state, batch, k)
        ld.append(float(m["loss_d"]))
        lg.append(float(m["loss_g"]))

    # D loss should trend down from its start (it is learning to separate)
    assert min(ld[4:]) < ld[0], f"D loss never improved: {ld}"
    # all losses finite
    assert all(np.isfinite(v) for v in ld + lg)
    # the adversarial coupling is live: G loss must respond (not frozen/constant)
    assert np.std(lg) > 1e-4, f"G loss is static: {lg}"


def test_generator_converges_to_easy_target():
    """The full engine must actually LEARN: on an all-bright target the generator's
    output mean should approach +0.9 within ~60 steps (verified: reaches ~0.9 by 50)."""
    gen = tganv2.MultiScaleGen(latent_size=8, width=16, height=16, num_channels=1,
                               fm_channels=8, additional_blocks=(8,), num_frames=4,
                               use_pallas=False)
    discrim = tganv2.MultiScaleDiscrim(discrim_down_blocks=(1, 1), num_channels=1,
                                       with_attn=False, use_pallas=False)
    gan = CondGan(gen=gen, discrims=[discrim])
    cfg = TrainConfig(frame_sizes=(8, 16), subsample_input=True, latent_size=8)
    optG = optax.adam(2e-4, b1=0.5, b2=0.999)
    optD = optax.adam(2e-4, b1=0.5, b2=0.999)
    batch = {"video": jnp.full((8, 4, 16, 16, 1), 0.9, jnp.float32)}
    state = init_state(gan, jax.random.key(0), batch, optG, optD, cfg)
    step = jax.jit(build_train_step(gan, L.RSGANLoss(), optG, optD, cfg))

    key = jax.random.key(1)
    for i in range(60):
        key, k = jax.random.split(key)
        state, m = step(state, batch, k)

    fakes = gan.generate(state.g_vars, jax.random.normal(jax.random.key(5), (8, 8)),
                         key=jax.random.key(2), train=True)
    mean_out = float(fakes[-1].mean())
    assert mean_out > 0.5, f"generator failed to move toward the target: {mean_out}"
