"""Frame-level WGAN-GP ResNet image GAN (reference txt2vid/models/img/models.py,
the improved-wgan-pytorch pair used by run_tgan.sh's active line and the CIFAR-10
sanity path).

Up blocks: BN-ReLU-(nearest-up + conv3)-BN-ReLU-conv3, shortcut nearest-up + conv1.
(The reference builds nearest-up as cat-x4 + depth-to-space, models.py:58-70 — the
same operation.) Down blocks: LN-ReLU-conv3-LN-ReLU-(conv3 + 2x2 mean pool), shortcut
mean-pool + conv1; LayerNorm normalizes over (H, W, C) as torch LayerNorm([C,hw,hw]).
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from txt2vid_tpu.ops.initializers import make_kernel_init
from txt2vid_tpu.ops.pooling import upsample_nearest_2d


def _mean_pool(x):
    return (x[:, ::2, ::2] + x[:, 1::2, ::2] + x[:, ::2, 1::2] + x[:, 1::2, 1::2]) / 4.0


class ResidualBlockUp(nn.Module):
    out_dim: int
    init_method: str = "xavier"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        ki = make_kernel_init(self.init_method)
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                       dtype=self.dtype, name=name)
        shortcut = nn.Conv(self.out_dim, (1, 1), kernel_init=ki, dtype=self.dtype,
                           name="conv_shortcut")(upsample_nearest_2d(x))
        h = nn.relu(bn("bn1")(x))
        h = nn.Conv(self.out_dim, (3, 3), use_bias=False, kernel_init=ki,
                    dtype=self.dtype, name="conv1")(upsample_nearest_2d(h))
        h = nn.relu(bn("bn2")(h))
        h = nn.Conv(self.out_dim, (3, 3), kernel_init=ki, dtype=self.dtype,
                    name="conv2")(h)
        return shortcut + h


class ResidualBlockDown(nn.Module):
    out_dim: int
    init_method: str = "xavier"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        ki = make_kernel_init(self.init_method)
        ln = lambda name: nn.LayerNorm(reduction_axes=(-3, -2, -1),
                                       feature_axes=(-3, -2, -1),
                                       epsilon=1e-5,  # torch LayerNorm eps
                                       dtype=self.dtype, name=name)
        shortcut = nn.Conv(self.out_dim, (1, 1), kernel_init=ki, dtype=self.dtype,
                           name="conv_shortcut")(_mean_pool(x))
        h = nn.relu(ln("ln1")(x))
        h = nn.Conv(x.shape[-1], (3, 3), use_bias=False, kernel_init=ki,
                    dtype=self.dtype, name="conv1")(h)
        h = nn.relu(ln("ln2")(h))
        h = nn.Conv(self.out_dim, (3, 3), kernel_init=ki, dtype=self.dtype,
                    name="conv2")(h)
        return shortcut + _mean_pool(h)


class Gen(nn.Module):
    """z (B, 128) -> (B, 64, 64, 3) (reference img/models.py:172-202)."""

    cond_dim: int = 0
    dim: int = 64
    init_method: str = "xavier"
    dtype: Any = None

    @property
    def latent_size(self) -> int:
        return 128

    @nn.compact
    def __call__(self, z, cond=None, train: bool = True):
        ki = make_kernel_init(self.init_method)
        d = self.dim
        if self.dtype is not None:
            z = z.astype(self.dtype)
        h = nn.Dense(4 * 4 * 8 * d, kernel_init=ki, dtype=self.dtype, name="ln1")(z)
        h = h.reshape(-1, 4, 4, 8 * d)
        for i, ch in enumerate((8 * d, 4 * d, 2 * d, d)):
            h = ResidualBlockUp(ch, self.init_method, self.dtype,
                                name=f"rb{i + 1}")(h, train=train)
        h = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 dtype=self.dtype, name="bn")(h))
        h = nn.Conv(3, (3, 3), kernel_init=ki, dtype=self.dtype, name="conv1")(h)
        return jnp.tanh(h)


class Discrim(nn.Module):
    """(B, 64, 64, 3) -> (B,) logits (reference img/models.py:143-170)."""

    cond_dim: int = 256
    dim: int = 64
    init_method: str = "xavier"
    dtype: Any = None

    @nn.compact
    def __call__(self, x=None, cond=None, xbar=None, train: bool = True):
        ki = make_kernel_init(self.init_method)
        d = self.dim
        if self.dtype is not None:
            x = x.astype(self.dtype)
        h = nn.Conv(d, (3, 3), kernel_init=ki, dtype=self.dtype, name="conv1")(x)
        for i, ch in enumerate((2 * d, 4 * d, 8 * d, 8 * d)):
            h = ResidualBlockDown(ch, self.init_method, self.dtype,
                                  name=f"rb{i + 1}")(h)
        h = h.reshape(-1, 4 * 4 * 8 * d).astype(jnp.float32)
        return nn.Dense(1, kernel_init=ki, name="ln1")(h)[:, 0]
