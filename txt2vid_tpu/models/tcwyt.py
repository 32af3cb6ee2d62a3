"""TCWYT ("To Create What You Tell") family (reference txt2vid/models/tcwyt/).

Deviations from the reference, deliberate and documented:
  * VideoDiscrim returns PER-SAMPLE logits (B,) instead of the reference's batch-mean
    scalar (video_discrim.py:55-57) — the mean is taken inside the loss, which is
    numerically identical for every loss in the zoo but keeps the output batched so the
    pairwise conditional loss and gradient penalty are well-defined.
  * FrameDiscrim / MotionDiscrim return (B, T[-1]) logits; the reference's per-pixel
    Python tiling loops (frame_discrim.py:79-81, motion_discrim.py:43-45) are a single
    broadcast, and the per-frame Python loop is a batch fold.
  * BatchNorm statistics in FrameMap/FrameDiscrim/MotionDiscrim: the reference's
    per-frame loop computes BN batch statistics PER FRAME (batch = B for each t);
    the batch fold here normalizes over (B*T) jointly — a larger, lower-variance
    statistic. Eval-mode (running-stats) behavior is exactly equivalent
    (tests/test_reference_parity.py asserts it); train-mode dynamics differ slightly.
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from txt2vid_tpu.ops.initializers import make_kernel_init


def _lrelu(x, slope=0.2):
    return nn.leaky_relu(x, negative_slope=slope)


class Gen(nn.Module):
    """[z ‖ cond] -> MLP -> 5-layer ConvTranspose3d stack -> (B, 16, 48, 48, C)
    (reference tcwyt/gen.py:5-49)."""

    z_size: int = 100
    cond_dim: int = 0
    num_channels: int = 3
    scale_factor: float = 1
    init_method: str = "xavier"
    dtype: Any = None

    @property
    def latent_size(self) -> int:
        return self.z_size

    @nn.compact
    def __call__(self, z, cond=None, train: bool = True):
        ki = make_kernel_init(self.init_method)
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                       dtype=self.dtype, name=name)
        s = self.scale_factor

        x = z if cond is None else jnp.concatenate([z, cond], axis=1)
        in_size = x.shape[-1]
        if self.dtype is not None:
            x = x.astype(self.dtype)

        x = nn.Dense(in_size, kernel_init=ki, dtype=self.dtype, name="input_map")(x)
        x = _lrelu(bn("input_bn")(x))
        x = x.reshape(x.shape[0], 1, 1, 1, in_size)

        x = nn.ConvTranspose(int(512 * s), (2, 6, 6), padding="VALID", use_bias=False,
                             kernel_init=ki, dtype=self.dtype, name="dc0")(x)
        x = _lrelu(bn("bn0")(x))
        for i, ch in enumerate((256, 128, 64)):
            x = nn.ConvTranspose(int(ch * s), (4, 4, 4), strides=(2, 2, 2),
                                 padding="SAME", use_bias=False, kernel_init=ki,
                                 dtype=self.dtype, name=f"dc{i + 1}")(x)
            x = _lrelu(bn(f"bn{i + 1}")(x))
        x = nn.ConvTranspose(self.num_channels, (1, 1, 1), use_bias=False,
                             kernel_init=ki, dtype=self.dtype, name="dc4")(x)
        return jnp.tanh(x)


class VideoDiscrim(nn.Module):
    """4-layer Conv3d pyramid + tiled-cond prediction head -> (B,) logits
    (reference tcwyt/video_discrim.py; also TGAN's discriminator)."""

    cond_dim: int = 256
    mid_ch: int = 64
    num_channels: int = 3
    negative_slope: float = 0.2
    init_method: str = "xavier"
    dtype: Any = None

    @nn.compact
    def __call__(self, x=None, cond=None, xbar=None, train: bool = True):
        ki = make_kernel_init(self.init_method)
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                       dtype=self.dtype, name=name)
        m = self.mid_ch
        if self.dtype is not None:
            x = x.astype(self.dtype)

        h = nn.Conv(m, (4, 4, 4), strides=2, padding="SAME", use_bias=False,
                    kernel_init=ki, dtype=self.dtype, name="conv0")(x)
        h = _lrelu(h, self.negative_slope)
        for i, ch in enumerate((m * 2, m * 4, m * 8)):
            h = nn.Conv(ch, (4, 4, 4), strides=2, padding="SAME", use_bias=False,
                        kernel_init=ki, dtype=self.dtype, name=f"conv{i + 1}")(h)
            h = _lrelu(bn(f"bn{i + 1}")(h), self.negative_slope)

        if cond is not None:
            if self.dtype is not None:
                cond = cond.astype(self.dtype)
            c = nn.Dense(self.cond_dim, kernel_init=ki, dtype=self.dtype,
                         name="cond_map")(cond)
            c = _lrelu(bn("cond_bn")(c), self.negative_slope)
            c = jnp.broadcast_to(c[:, None, None, None, :],
                                 h.shape[:4] + (self.cond_dim,))
            h = jnp.concatenate([h, c], axis=-1)
            h = nn.Conv(512, (1, 1, 1), use_bias=False, kernel_init=ki,
                        dtype=self.dtype, name="pred0")(h)
            h = _lrelu(bn("pred_bn")(h), self.negative_slope)
            h = nn.Conv(1, (1, 3, 3), padding="VALID", use_bias=False,
                        kernel_init=ki, dtype=self.dtype, name="pred1")(h)
        else:
            h = nn.Conv(1, (1, 3, 3), strides=2, padding="VALID", use_bias=False,
                        kernel_init=ki, dtype=self.dtype, name="pred")(h)

        # per-sample mean logit (reference means over the whole batch; see module doc)
        return jnp.mean(h.reshape(h.shape[0], -1).astype(jnp.float32), axis=1)


class FrameMap(nn.Module):
    """Shared per-frame 2D conv pyramid -> 512-ch maps, the `--M` sample mapping
    (reference tcwyt/frame_discrim.py:4-37). (B, T, H, W, C) -> (B, T, H', W', 512)."""

    num_channels: int = 3
    init_method: str = "xavier"
    dtype: Any = None

    @nn.compact
    def __call__(self, videos, train: bool = True):
        ki = make_kernel_init(self.init_method)
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                       dtype=self.dtype, name=name)
        b, t = videos.shape[:2]
        h = videos.reshape((b * t,) + videos.shape[2:])
        if self.dtype is not None:
            h = h.astype(self.dtype)
        for i, ch in enumerate((64, 128, 256)):
            h = nn.Conv(ch, (4, 4), strides=2, padding="SAME", use_bias=False,
                        kernel_init=ki, dtype=self.dtype, name=f"conv{i}")(h)
            h = _lrelu(bn(f"bn{i}")(h))
        h = nn.Conv(512, (4, 4), strides=2, padding="SAME", use_bias=False,
                    kernel_init=ki, dtype=self.dtype, name="conv3")(h)
        return h.reshape((b, t) + h.shape[1:])


class _SentTiledHead(nn.Module):
    """Shared frame/motion head: 1x1 conv map + spatially tiled sent_map(cond) concat +
    predictor (1x1 conv -> k2 s2 conv to a per-frame logit)."""

    cond_dim: int = 256
    init_method: str = "xavier"
    dtype: Any = None

    @nn.compact
    def __call__(self, frames, cond, train: bool = True):
        ki = make_kernel_init(self.init_method)
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                       dtype=self.dtype, name=name)
        b, t = frames.shape[:2]
        if self.dtype is not None:
            frames = frames.astype(self.dtype)
            cond = cond.astype(self.dtype)

        sent = nn.Dense(self.cond_dim, kernel_init=ki, dtype=self.dtype,
                        name="sent_map")(cond)
        sent = _lrelu(bn("sent_bn")(sent))

        h = frames.reshape((b * t,) + frames.shape[2:])
        h = nn.Conv(512, (1, 1), use_bias=False, kernel_init=ki, dtype=self.dtype,
                    name="map")(h)
        h = _lrelu(bn("map_bn")(h))

        # tile sentence over (T, H, W) — the reference's per-pixel double loop
        sent_t = jnp.broadcast_to(sent[:, None, None, None, :],
                                  (b, t) + h.shape[1:3] + (self.cond_dim,))
        sent_t = sent_t.reshape((b * t,) + sent_t.shape[2:])
        h = jnp.concatenate([h, sent_t], axis=-1)

        h = nn.Conv(512, (1, 1), use_bias=False, kernel_init=ki, dtype=self.dtype,
                    name="pred0")(h)
        h = _lrelu(bn("pred_bn")(h))
        h = nn.Conv(1, (2, 2), strides=2, padding="VALID", use_bias=False,
                    kernel_init=ki, dtype=self.dtype, name="pred1")(h)
        return jnp.mean(h.reshape(b, t, -1).astype(jnp.float32), axis=-1)  # (B, T)


class FrameDiscrim(nn.Module):
    """Per-frame conditional discriminator over FrameMap features (reference
    tcwyt/frame_discrim.py:40-90). xbar: (B, T, H', W', 512) -> (B, T)."""

    cond_dim: int = 256
    init_method: str = "xavier"
    dtype: Any = None

    @nn.compact
    def __call__(self, x=None, cond=None, xbar=None, train: bool = True):
        return _SentTiledHead(self.cond_dim, self.init_method, self.dtype,
                              name="head")(xbar, cond, train=train)


class MotionDiscrim(nn.Module):
    """As FrameDiscrim on temporal differences xbar[1:] - xbar[:-1] (reference
    tcwyt/motion_discrim.py:31-52). -> (B, T-1)."""

    cond_dim: int = 256
    init_method: str = "xavier"
    dtype: Any = None

    @nn.compact
    def __call__(self, x=None, cond=None, xbar=None, train: bool = True):
        motions = xbar[:, 1:] - xbar[:, :-1]
        return _SentTiledHead(self.cond_dim, self.init_method, self.dtype,
                              name="head")(motions, cond, train=train)
