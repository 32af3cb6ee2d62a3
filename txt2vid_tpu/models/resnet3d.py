"""3D ResNet discriminator backbone (reference txt2vid/models/resnet3d.py).

Structure: stem residual block (conv3-ReLU-conv3 + (1,2,2)-kernel stride-2 avg pool,
skip = pool + 1x1 conv), `num_down_blocks` DownBlocks doubling 128->..., an Attention3d
after block 0 when with_attn, global sum-pool over (T, H, W), an unconditional scalar
head, and a StackGAN++-style conditional head over [features ‖ cond]. Returns
(uncond_logit, cond_logit | None, features) and can skip the backbone via
`computed_features` (resnet3d.py:38-57).
"""

from typing import Any

import numpy as np
import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from txt2vid_tpu.models.layers import DownBlock, Attention3d
from txt2vid_tpu.ops.initializers import make_kernel_init, RESIDUAL_GAIN


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
    dtype: Any = None

    @nn.compact
    def __call__(self, x=None, cond=None, xbar=None, computed_features=None, train: bool = True):
        ki = make_kernel_init(self.init_method)
        ki_res = make_kernel_init(self.init_method, RESIDUAL_GAIN)

        uncond = None
        if computed_features is not None:
            feats = computed_features
        else:
            # stem residual block
            h = nn.Conv(self.mid_ch, (3, 3, 3), kernel_init=ki_res,
                        dtype=self.dtype, name="stem_conv1")(x)
            h = nn.relu(h)
            h = nn.Conv(self.mid_ch, (3, 3, 3), kernel_init=ki_res,
                        dtype=self.dtype, name="stem_conv2")(h)
            h = _avg_pool_122_s2(h)
            identity = _avg_pool_122_s2(x)
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
