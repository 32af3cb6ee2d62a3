"""TGAN generator family (reference txt2vid/models/tgan/).

FrameSeedGenerator (temporal_gen.py): 1D transposed-conv stack expanding one latent
into exactly 16 per-frame fast latents, Tanh output.
VideoFrameGenerator (gen.py:10-43): per-frame 2D transposed-conv decoder 4x4 -> 64x64
from [h_slow ‖ h_fast].
Gen (gen.py:45-74): concatenates cond into z_slow, tiles z_slow across the 16 frames,
folds time into batch for the frame decoder. (The reference's leftover debug prints at
gen.py:61,70-71 are not reproduced.)
Discrim is an alias of the TCWYT video discriminator (reference tgan/discrim.py:1-2).
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from txt2vid_tpu.ops.initializers import make_kernel_init


class FrameSeedGenerator(nn.Module):
    """(B, z_slow_dim) -> (B, 16, z_fast_dim)."""

    z_fast_dim: int = 256
    init_method: str = "xavier"
    dtype: Any = None

    @nn.compact
    def __call__(self, z_slow, train: bool = True):
        ki = make_kernel_init(self.init_method)
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                       dtype=self.dtype, name=name)
        h = z_slow[:, None, :]                              # (B, L=1, C)
        if self.dtype is not None:
            h = h.astype(self.dtype)
        h = nn.ConvTranspose(512, (1,), strides=(1,), padding="VALID",
                             kernel_init=ki, dtype=self.dtype, name="dc0")(h)
        h = nn.relu(bn("bn0")(h))
        for i, ch in enumerate((256, 128, 128)):
            h = nn.ConvTranspose(ch, (4,), strides=(2,), padding="SAME",
                                 kernel_init=ki, dtype=self.dtype,
                                 name=f"dc{i + 1}")(h)
            h = nn.relu(bn(f"bn{i + 1}")(h))
        h = nn.ConvTranspose(self.z_fast_dim, (4,), strides=(2,), padding="SAME",
                             kernel_init=ki, dtype=self.dtype,
                             name="dc4")(h)  # (B, 16, z_fast)
        return jnp.tanh(h)


class VideoFrameGenerator(nn.Module):
    """(B, z_slow), (B, z_fast) -> (B, 64, 64, out_channels)."""

    out_channels: int = 3
    bottom_width: int = 4
    conv_ch: int = 512
    init_method: str = "xavier"
    dtype: Any = None

    @nn.compact
    def __call__(self, z_slow, z_fast, train: bool = True):
        ki = make_kernel_init(self.init_method)
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                       dtype=self.dtype, name=name)
        n = z_slow.shape[0]
        bw, ch = self.bottom_width, self.conv_ch
        mid = bw * bw * ch // 2
        if self.dtype is not None:
            z_slow = z_slow.astype(self.dtype)
            z_fast = z_fast.astype(self.dtype)

        hs = nn.relu(bn("bn0s")(nn.Dense(mid, kernel_init=ki, dtype=self.dtype,
                                         name="l0s")(z_slow)))
        hf = nn.relu(bn("bn0f")(nn.Dense(mid, kernel_init=ki, dtype=self.dtype,
                                         name="l0f")(z_fast)))
        h = jnp.concatenate(
            [hs.reshape(n, bw, bw, ch // 2), hf.reshape(n, bw, bw, ch // 2)], axis=-1)
        for i, f in enumerate((ch // 2, ch // 4, ch // 8, ch // 16)):
            h = nn.ConvTranspose(f, (4, 4), strides=(2, 2), padding="SAME",
                                 kernel_init=ki, dtype=self.dtype,
                                 name=f"dc{i + 1}")(h)
            h = nn.relu(bn(f"bn{i + 1}")(h))
        h = nn.ConvTranspose(self.out_channels, (3, 3), strides=(1, 1), padding="SAME",
                             kernel_init=ki, dtype=self.dtype, name="dc5")(h)
        return jnp.tanh(h)


class Gen(nn.Module):
    """(B, z_slow_dim) [, cond (B, cond_dim)] -> (B, 16, 64, 64, out_channels)."""

    z_slow_dim: int = 256
    z_fast_dim: int = 256
    cond_dim: int = 0
    out_channels: int = 3
    bottom_width: int = 4
    conv_ch: int = 512
    init_method: str = "xavier"
    dtype: Any = None

    @property
    def latent_size(self) -> int:
        return self.z_slow_dim

    @nn.compact
    def __call__(self, z_slow, cond=None, train: bool = True):
        if cond is not None:
            z_slow = jnp.concatenate([z_slow, cond], axis=-1)
        z_fast = FrameSeedGenerator(self.z_fast_dim, self.init_method,
                                    dtype=self.dtype,
                                    name="fsgen")(z_slow, train=train)   # (B, 16, zf)
        b, n_frames, _ = z_fast.shape
        z_fast = z_fast.reshape(b * n_frames, -1)
        z_slow_tiled = jnp.repeat(z_slow[:, None, :], n_frames, axis=1).reshape(
            b * n_frames, -1)
        frames = VideoFrameGenerator(self.out_channels, self.bottom_width, self.conv_ch,
                                     self.init_method, dtype=self.dtype, name="vgen")(
            z_slow_tiled, z_fast, train=train)
        return frames.reshape(b, n_frames, *frames.shape[1:])


def Discrim(**kwargs):
    """Alias of the TCWYT video discriminator (reference tgan/discrim.py:1-2)."""
    from txt2vid_tpu.models.tcwyt import VideoDiscrim
    return VideoDiscrim(**kwargs)
