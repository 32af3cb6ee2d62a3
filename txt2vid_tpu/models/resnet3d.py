"""3D ResNet discriminator backbone (reference txt2vid/models/resnet3d.py).

Structure: stem residual block (conv3-ReLU-conv3 + (1,2,2)-kernel stride-2 avg pool,
skip = pool + 1x1 conv), `num_down_blocks` DownBlocks doubling 128->..., an Attention3d
after block 0 when with_attn, global sum-pool over (T, H, W), an unconditional scalar
head, and a StackGAN++-style conditional head over [features ‖ cond]. Returns
(uncond_logit, cond_logit | None, features) and can skip the backbone via
`computed_features` (resnet3d.py:38-57).
"""

import os
from typing import Any

import numpy as np
import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from txt2vid_tpu.models.layers import DownBlock, Attention3d
from txt2vid_tpu.ops.initializers import make_kernel_init, RESIDUAL_GAIN


class _C1Conv3d(nn.Module):
    """C_in=1 3D conv computed without im2col lane padding.

    The as-written C_in=1 stem conv moves ~350x its input bytes on TPU: XLA's
    conv lowering pads every im2col patch column to a full lane tile, so 7/8+
    of the stem's HBM traffic is zeros (measured: 12.8 ms / 5.92 GB at the
    flagship stem shape, docs/r4/r8_c1_padding_probe.log). This module holds
    the IDENTICAL parameters an `nn.Conv(features, (kd,kh,kw))` of a
    1-channel input would (kernel (kd,kh,kw,1,C), bias (C,): checkpoints and
    torch imports interop bit-for-bit) and computes the identical function as

      einsum — stack the kd*kh*kw shifted taps into a (..., K) patch tensor
               and contract with the (K, C) reshaped kernel on the MXU; or
      shift  — accumulate the taps as lane-friendly elementwise
               multiply-adds on the VPU (XLA loop-fuses all K taps).

    Both differ from the conv only in fp summation order. Selection via
    `impl` ("einsum" | "shift" | "conv"; "conv" falls back to lax conv).
    """

    features: int
    kernel_size: tuple = (3, 3, 3)
    kernel_init: Any = nn.initializers.lecun_normal()
    impl: str = "einsum"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        kd, kh, kw = self.kernel_size
        kernel = self.param("kernel", self.kernel_init,
                            self.kernel_size + (1, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        if self.impl == "conv" or x.shape[-1] != 1:
            y = lax.conv_general_dilated(
                x, kernel, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            return y + bias
        B, T, H, W = x.shape[:4]
        xp = jnp.pad(x[..., 0], ((0, 0), (kd // 2, kd - 1 - kd // 2),
                                 (kh // 2, kh - 1 - kh // 2),
                                 (kw // 2, kw - 1 - kw // 2)))
        taps = [xp[:, dt:dt + T, dy:dy + H, dx:dx + W]
                for dt in range(kd) for dy in range(kh) for dx in range(kw)]
        kf = kernel.reshape(kd * kh * kw, self.features)
        if self.impl == "einsum":
            patches = jnp.stack(taps, axis=-1)
            y = jnp.einsum("bthwk,kc->bthwc", patches, kf,
                           preferred_element_type=x.dtype)
        else:
            y = taps[0][..., None] * kf[0]
            for i in range(1, len(taps)):
                y = y + taps[i][..., None] * kf[i]
        return y + bias


def _resolve_stem_impl(impl: str, x_shape) -> str:
    """"auto" -> the measured per-shape winner, overridable per-process for
    forensics (the flagship D-backward's finiteness has flipped with program
    composition before — gan/train_step.py notes — so a no-code-change
    fallback matters).

    Measurement (scripts/probe_stem_fold2.py on TPU v5e, fwd+bwd, fresh
    inputs per iteration): at the flagship pyramid's 128px scale the einsum
    formulation is 3.0-3.6x faster than the conv (2.4-2.9 ms vs 8.6-8.8 ms,
    f32/bf16) — the C=1 im2col lane-padding tax scales with spatial size —
    while at the 32px/64px scales the conv matches or beats it (the patch
    stack's materialization dominates there). So "auto" folds only stems
    whose spatial extent reaches 128."""
    impl = os.environ.get("TXT2VID_STEM_IMPL", impl)
    if impl != "auto":
        return impl
    h, w = x_shape[2], x_shape[3]
    return "einsum" if max(h, w) >= 128 else "conv"


def _avg_pool_122_s2(x):
    """AvgPool3d(kernel=(1,2,2), stride=2) — stride 2 in T as well, i.e. every other
    frame with 2x2 spatial averaging (reference resnet3d.py:16,18)."""
    window = (1, 1, 2, 2, 1)
    strides = (1, 2, 2, 2, 1)
    summed = lax.reduce_window(x, 0.0, lax.add, window, strides, [(0, 0)] * 5)
    return summed / float(np.prod(window))


class Resnet3D(nn.Module):
    num_channels: int = 1          # kept for parity; channels inferred from input
    mid_ch: int = 64
    cond_dim: int = 0
    num_down_blocks: int = 4
    wide: bool = False
    with_attn: bool = True
    # Conditional-head form:
    #   "concat" — the reference's Dense over [feats ‖ cond] (resnet3d.py:33-35).
    #     NOTE this head is ADDITIVE in cond: cond_logit = w_f.f(x) + w_c.c, so the
    #     pairing losses carry NO video-caption interaction (the cond term cancels
    #     in real_cc - fake_cc and is video-independent in real_cc - real_ic) —
    #     kept as the parity default, but it cannot drive semantic alignment.
    #   "proj"   — projection cGAN (Miyato & Koyama 2018): psi(f(x)) + c^T V f(x),
    #     a bilinear interaction that scores how well THIS video matches THIS
    #     caption; use for caption-semantic conditioning.
    cond_head: str = "concat"
    init_method: str = "xavier"
    use_pallas: bool | None = None
    # Stem implementation for 1-channel inputs ("auto" | "einsum" | "shift" |
    # "conv"): parameter layout is identical across choices (see _C1Conv3d),
    # only the compute formulation differs. Multi-channel inputs always take
    # the conv path.
    stem_impl: str = "auto"
    dtype: Any = None

    @nn.compact
    def __call__(self, x=None, cond=None, xbar=None, computed_features=None, train: bool = True):
        ki = make_kernel_init(self.init_method)
        ki_res = make_kernel_init(self.init_method, RESIDUAL_GAIN)

        uncond = None
        if computed_features is not None:
            feats = computed_features
        else:
            # stem residual block. For C=1 inputs the first conv and the skip
            # conv use the padding-free formulation (_C1Conv3d) — identical
            # params and math, ~4x less HBM traffic at the flagship shape.
            stem_impl = _resolve_stem_impl(self.stem_impl, x.shape)
            if x.shape[-1] == 1 and stem_impl != "conv":
                h = _C1Conv3d(self.mid_ch, (3, 3, 3), kernel_init=ki_res,
                              impl=stem_impl, dtype=self.dtype,
                              name="stem_conv1")(x)
            else:
                h = nn.Conv(self.mid_ch, (3, 3, 3), kernel_init=ki_res,
                            dtype=self.dtype, name="stem_conv1")(x)
            h = nn.relu(h)
            h = nn.Conv(self.mid_ch, (3, 3, 3), kernel_init=ki_res,
                        dtype=self.dtype, name="stem_conv2")(h)
            h = _avg_pool_122_s2(h)
            identity = _avg_pool_122_s2(x)
            if x.shape[-1] == 1 and stem_impl != "conv":
                identity = _C1Conv3d(self.mid_ch, (1, 1, 1), kernel_init=ki,
                                     impl=stem_impl, dtype=self.dtype,
                                     name="stem_skip")(identity)
            else:
                identity = nn.Conv(self.mid_ch, (1, 1, 1), kernel_init=ki,
                                   dtype=self.dtype, name="stem_skip")(identity)
            h = identity + h

            out_ch = 128
            for i in range(self.num_down_blocks):
                h = DownBlock(h.shape[-1], out_ch, wide=self.wide,
                              init_method=self.init_method, dtype=self.dtype,
                              name=f"down{i}")(h)
                if i == 0 and self.with_attn:
                    h = Attention3d(out_ch, init_method=self.init_method,
                                    use_pallas=self.use_pallas, dtype=self.dtype,
                                    name="attn")(h)
                out_ch *= 2

            feats = jnp.sum(h.astype(jnp.float32), axis=(1, 2, 3))  # (B, C) sum pool, f32
            uncond = nn.Dense(1, kernel_init=ki, name="fc_uncond")(feats)

        if cond is not None:
            assert self.cond_dim > 0
            if self.cond_head == "proj":
                v = nn.Dense(feats.shape[-1], use_bias=False, kernel_init=ki,
                             name="cond_proj")(cond.astype(feats.dtype))
                cond_logit = nn.Dense(1, kernel_init=ki, name="fc")(feats) \
                    + jnp.sum(v * feats, axis=1, keepdims=True)
            else:
                x_plus_cond = jnp.concatenate([feats, cond.astype(feats.dtype)],
                                              axis=1)
                cond_logit = nn.Dense(1, kernel_init=ki, name="fc")(x_plus_cond)
            return uncond, cond_logit, feats

        return uncond, None, feats
