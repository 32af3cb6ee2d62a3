"""Shared building blocks (reference txt2vid/models/layers.py, re-designed for TPU).

Channel-last layout. The non-local Attention blocks route their softmax core through
the fused Pallas kernel on TPU (txt2vid_tpu/ops/pallas_attention.py) and plain XLA on
CPU; both are numerically the reference semantics (unscaled logits, max-pooled phi/g).
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from txt2vid_tpu.ops.initializers import make_kernel_init, RESIDUAL_GAIN
from txt2vid_tpu.ops.attention import attention_core_auto
from txt2vid_tpu.ops.pooling import (
    avg_pool_3d_shape_aware, max_pool_2d, max_pool_3d, upsample_nearest_2d)


class Attention(nn.Module):
    """2D non-local block, SA-GAN/BigGAN style (reference models/layers.py:10-36).

    theta/phi: C/8 channels, g: C/2, 2x2 max-pool on phi/g, unscaled softmax over
    H*W x H*W/4, output 1x1 conv, learnable scalar gamma init 0, residual.
    Input (B, H, W, C).
    """

    ch: int
    init_method: str = "xavier"
    use_pallas: bool | None = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ki = make_kernel_init(self.init_method)
        conv = lambda f, name: nn.Conv(f, (1, 1), use_bias=False, kernel_init=ki,
                                       dtype=self.dtype, name=name)
        theta = conv(self.ch // 8, "theta")(x)
        phi = max_pool_2d(conv(self.ch // 8, "phi")(x))
        g = max_pool_2d(conv(self.ch // 2, "g")(x))

        n, m = h * w, (h // 2) * (w // 2)
        o = attention_core_auto(
            theta.reshape(b, n, self.ch // 8),
            phi.reshape(b, m, self.ch // 8),
            g.reshape(b, m, self.ch // 2),
            use_pallas=self.use_pallas,
        ).reshape(b, h, w, self.ch // 2)
        o = nn.Conv(self.ch, (1, 1), use_bias=False, kernel_init=ki,
                    dtype=self.dtype, name="o")(o)
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return gamma.astype(x.dtype) * o + x


class Attention3d(nn.Module):
    """Video non-local block (reference models/layers.py:39-68, video-nonlocal-net
    style): same as Attention but Conv3d projections, [1,2,2] max-pool, attention over
    T*H*W x T*H*W/4. Input (B, T, H, W, C)."""

    ch: int
    init_method: str = "xavier"
    use_pallas: bool | None = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        ki = make_kernel_init(self.init_method)
        conv = lambda f, name: nn.Conv(f, (1, 1, 1), use_bias=False, kernel_init=ki,
                                       dtype=self.dtype, name=name)
        theta = conv(self.ch // 8, "theta")(x)
        phi = max_pool_3d(conv(self.ch // 8, "phi")(x))
        g = max_pool_3d(conv(self.ch // 2, "g")(x))

        n, m = t * h * w, t * (h // 2) * (w // 2)
        o = attention_core_auto(
            theta.reshape(b, n, self.ch // 8),
            phi.reshape(b, m, self.ch // 8),
            g.reshape(b, m, self.ch // 2),
            use_pallas=self.use_pallas,
        ).reshape(b, t, h, w, self.ch // 2)
        o = nn.Conv(self.ch, (1, 1, 1), use_bias=False, kernel_init=ki,
                    dtype=self.dtype, name="o")(o)
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return gamma.astype(x.dtype) * o + x


class UpBlock(nn.Module):
    """Pre-activation residual 2x-upsample block (reference models/layers.py:152-195):
    main = BN-ReLU-Upsample-conv3x3-BN-ReLU-conv3x3 (sqrt(2)-gain init, residual path),
    identity = Upsample (+1x1 conv on channel change); optional trailing Attention."""

    in_channels: int
    out_channels: int | None = None
    wide: bool = False
    with_non_local: bool = False
    init_method: str = "xavier"
    use_pallas: bool | None = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        out_ch = self.out_channels if self.out_channels is not None else self.in_channels
        mid_ch = self.in_channels if self.wide else out_ch
        ki_res = make_kernel_init(self.init_method, RESIDUAL_GAIN)
        ki = make_kernel_init(self.init_method)
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                       dtype=self.dtype, name=name)

        h = bn("bn1")(x)
        h = nn.relu(h)
        h = upsample_nearest_2d(h)
        h = nn.Conv(mid_ch, (3, 3), kernel_init=ki_res, dtype=self.dtype,
                    name="conv1")(h)
        h = bn("bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(out_ch, (3, 3), kernel_init=ki_res, dtype=self.dtype,
                    name="conv2")(h)

        identity = upsample_nearest_2d(x)
        if self.in_channels != out_ch:
            identity = nn.Conv(out_ch, (1, 1), kernel_init=ki, dtype=self.dtype,
                               name="conv_identity")(identity)

        h = identity + h
        if self.with_non_local:
            h = Attention(out_ch, init_method=self.init_method,
                          use_pallas=self.use_pallas, dtype=self.dtype,
                          name="attn")(h)
        return h


class DownSample(nn.Module):
    """Shape-aware 3D average pool (reference models/layers.py:197-217)."""

    def __call__(self, x):
        return avg_pool_3d_shape_aware(x)


class DownBlock(nn.Module):
    """Residual 3D down block (reference models/layers.py:219-243): main =
    ReLU-conv3-ReLU-conv3-DownSample (sqrt(2) gain), identity = 1x1conv-DownSample."""

    in_channels: int
    out_channels: int | None = None
    wide: bool = True
    init_method: str = "xavier"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        out_ch = self.out_channels if self.out_channels is not None else self.in_channels
        mid_ch = out_ch if self.wide else self.in_channels
        ki_res = make_kernel_init(self.init_method, RESIDUAL_GAIN)
        ki = make_kernel_init(self.init_method)

        h = nn.relu(x)
        h = nn.Conv(mid_ch, (3, 3, 3), kernel_init=ki_res, dtype=self.dtype,
                    name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(out_ch, (3, 3, 3), kernel_init=ki_res, dtype=self.dtype,
                    name="conv2")(h)
        h = avg_pool_3d_shape_aware(h)

        identity = nn.Conv(out_ch, (1, 1, 1), kernel_init=ki, dtype=self.dtype,
                           name="conv_identity")(x)
        identity = avg_pool_3d_shape_aware(identity)
        return identity + h


class RenderBlock(nn.Module):
    """BN-ReLU-conv3x3-Tanh to RGB (reference models/layers.py:245-259)."""

    in_channels: int
    out_channels: int = 3
    init_method: str = "xavier"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn")(x)
        h = nn.relu(h)
        h = nn.Conv(self.out_channels, (3, 3), kernel_init=make_kernel_init(self.init_method),
                    dtype=self.dtype, name="conv")(h)
        return jnp.tanh(h)
