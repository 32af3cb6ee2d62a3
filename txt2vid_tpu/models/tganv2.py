"""TGANv2 multi-scale generator & discriminator (reference txt2vid/models/tganv2/,
tganv2_cond/ share this implementation — the conditional variant differs only in the
latent concat and a non-local block, see txt2vid_tpu/models/tganv2_cond.py).

Generator (reference tganv2/gen.py): z [‖ cond] -> fc -> (fm_h, fm_w, 1024) latent
plane -> ConvLSTM unroll of `num_frames` steps -> frames merged into batch -> base
UpBlock stack 1024-512-256-128 -> `additional_blocks` UpBlocks, each paired with a
RenderBlock; during training a Subsample (batch & frames halve, random phase) runs
between blocks and every scale is rendered; at eval only the final scale is rendered.

Discriminator (reference tganv2/discrim.py): one shared (or per-scale) Resnet3D applied
to the positional list of scales.
"""

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from txt2vid_tpu.models.layers import UpBlock, RenderBlock
from txt2vid_tpu.models.conv_lstm import ConvLSTM
from txt2vid_tpu.models.resnet3d import Resnet3D
from txt2vid_tpu.ops.initializers import make_kernel_init
from txt2vid_tpu.ops.subsample import subsample_video


class BaseFrameGen(nn.Module):
    """UpBlock stack 1024 -> 512 -> 256 -> 128 (reference tganv2/gen.py:7-20)."""

    in_channels: int = 1024
    out_channels: int = 128
    init_method: str = "xavier"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = UpBlock(self.in_channels, 512, init_method=self.init_method,
                    dtype=self.dtype, name="up0")(x, train)
        x = UpBlock(512, 256, init_method=self.init_method,
                    dtype=self.dtype, name="up1")(x, train)
        x = UpBlock(256, self.out_channels, init_method=self.init_method,
                    dtype=self.dtype, name="up2")(x, train)
        return x


class MultiScaleGen(nn.Module):
    """z: (B, latent_size) [, cond: (B, cond_dim)] -> list of rendered videos
    (B_i, T_i, H_i, W_i, C), smallest scale first; B_i = B/2^i, T_i = T/2^i while
    training (subsample pyramid), single final scale at eval.

    `with_non_local` adds an Attention after additional block len-2 (the conditional
    variant's only architectural difference, tganv2_cond/gen.py:58). Needs an rng
    stream named "sample" when train=True (subsample phase)."""

    latent_size: int = 256
    width: int = 128
    height: int = 128
    num_channels: int = 3
    additional_blocks: Sequence[int] = (64, 32, 32)
    fm_channels: int = 1024
    num_frames: int = 16
    cond_dim: int = 0
    no_lstm: bool = False
    fm_stride: int | None = None   # latent-plane downscale; None = reference width//64
    with_non_local: bool = False
    init_method: str = "xavier"
    use_pallas: bool | None = None
    dtype: Any = None
    remat: bool = False   # rematerialize block activations (memory for large configs)

    @nn.compact
    def __call__(self, z, cond=None, train: bool = True, output_blocks=None):
        # Latent-plane size. The reference hardcodes width//64 (tganv2/gen.py:31)
        # — correct only at its fixed 3 additional blocks, where base(x8) plus
        # three x2 blocks reproduces `width`; with a different pyramid depth the
        # final render silently diverges from `width`, and the base is
        # structurally pinned to width/8. `fm_stride=None` keeps reference
        # semantics exactly (every reference config and the parity tests);
        # setting it overrides the plane downscale so shallower pyramids honor
        # `width` — e.g. fm_stride=32 gives a 3-scale 32/64/128 generator whose
        # 32px base can actually render a digit glyph (RESULTS.md round 3,
        # 128px alignment hypothesis).
        stride = self.fm_stride or 64
        fm_w = max(1, self.width // stride)
        fm_h = max(1, self.height // stride)
        fm_size = fm_w * fm_h * self.fm_channels
        ki = make_kernel_init(self.init_method)

        x = z
        if cond is not None:
            x = jnp.concatenate([x, cond], axis=1)
        b = x.shape[0]
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.Dense(fm_size, kernel_init=ki, dtype=self.dtype, name="fc")(x)

        if self.no_lstm:
            from txt2vid_tpu.models.tgan import FrameSeedGenerator
            # FrameSeedGenerator's deconv stack emits exactly 16 seeds
            # (temporal_gen.py:10-34); slice to num_frames <= 16 rather than
            # silently emitting the wrong frame count (fixes the reference's and
            # round-2's hardcoded 16, tganv2/gen.py:40-43).
            assert self.num_frames <= 16, "no_lstm path generates at most 16 frames"
            seeds = FrameSeedGenerator(z_fast_dim=fm_size, init_method=self.init_method,
                                       name="frame_seed_gen")(x, train=train)  # (B, 16, fm_size)
            num_frames = self.num_frames
            x = seeds[:, :num_frames].reshape(b, num_frames, fm_h, fm_w, -1)
        else:
            x = x.reshape(b, fm_h, fm_w, self.fm_channels)
            x = ConvLSTM(hidden_channels=(self.fm_channels,), kernel_size=3,
                         step=self.num_frames, init_method=self.init_method,
                         dtype=self.dtype, name="clstm")(x)     # (B, T, h, w, C)
            num_frames = self.num_frames

        # fold time into batch for the 2D block stack
        x = x.reshape((-1,) + x.shape[2:])

        base_cls = BaseFrameGen
        up_cls = UpBlock
        if self.remat:
            # static_argnums counts self at 0: (self, x, train) -> train = 2
            base_cls = nn.remat(BaseFrameGen, static_argnums=(2,))
            up_cls = nn.remat(UpBlock, static_argnums=(2,))

        blocks = [base_cls(init_method=self.init_method, dtype=self.dtype,
                           name="base")]
        renders = [RenderBlock(128, self.num_channels, init_method=self.init_method,
                               dtype=self.dtype, name="render_base")]
        prev = 128
        for i, ch in enumerate(self.additional_blocks):
            blocks.append(up_cls(
                prev, ch, init_method=self.init_method,
                with_non_local=self.with_non_local and i == len(self.additional_blocks) - 2,
                use_pallas=self.use_pallas, dtype=self.dtype, name=f"up{i}"))
            renders.append(RenderBlock(ch, self.num_channels,
                                       init_method=self.init_method,
                                       dtype=self.dtype, name=f"render{i}"))
            prev = ch

        rendered = []
        for i, (block, render) in enumerate(zip(blocks, renders)):
            if i != 0 and train:
                v = x.reshape((-1, num_frames) + x.shape[1:])
                v, _ = subsample_video(v, self.make_rng("sample"))
                num_frames //= 2
                x = v.reshape((-1,) + v.shape[2:])

            x = block(x, train)   # positional: remat static_argnums covers train

            if i == len(blocks) - 1 or train or (output_blocks is not None and i in output_blocks):
                r = render(x, train=train)
                rendered.append(r.reshape((-1, num_frames) + r.shape[1:]))

        return rendered


class MultiScaleDiscrim(nn.Module):
    """Positional list of scales -> list of (uncond, cond, features) triples
    (reference tganv2/discrim.py & tganv2_cond/discrim.py — whose `computed_features`
    forwarding bug at discrim.py:40-41 is fixed here)."""

    discrim_down_blocks: Sequence[int] = (4, 4, 4, 4)
    num_channels: int = 3
    cond_dim: int = 0
    single_discrim: bool = True
    wide: bool = False
    with_attn: bool = True
    cond_head: str = "concat"    # "concat" (reference parity) | "proj" (see Resnet3D)
    init_method: str = "xavier"
    use_pallas: bool | None = None
    stem_impl: str = "auto"      # C=1 stem formulation — see Resnet3D.stem_impl
    dtype: Any = None
    remat: bool = False

    # flags the per-scale gradient-penalty path (reference losses.py:189 keys off a
    # `sub_discrims` attribute)
    is_multiscale: bool = True

    @nn.compact
    def __call__(self, x, cond=None, xbar=None, computed_features=None, train: bool = True,
                 scale_indices=None):
        cls = Resnet3D
        if self.remat:
            # (self, x, cond, xbar, computed_features, train) -> train = 5
            cls = nn.remat(Resnet3D, static_argnums=(5,))

        def make(db, name):
            return cls(num_channels=self.num_channels, cond_dim=self.cond_dim,
                       num_down_blocks=db, wide=self.wide, with_attn=self.with_attn,
                       cond_head=self.cond_head, init_method=self.init_method,
                       use_pallas=self.use_pallas, stem_impl=self.stem_impl,
                       dtype=self.dtype, name=name)

        if self.single_discrim:
            shared = make(self.discrim_down_blocks[-1], "discrim")
            subs = [shared] * len(self.discrim_down_blocks)
        else:
            subs = [make(db, f"discrim{i}") for i, db in enumerate(self.discrim_down_blocks)]

        # scale_indices maps positional inputs to sub-discriminators — used by the
        # per-scale gradient-penalty path to evaluate a single scale in isolation
        if scale_indices is None:
            scale_indices = range(len(x))

        out = []
        for pos, (si, scale) in enumerate(zip(scale_indices, x)):
            if self.dtype is not None:
                scale = scale.astype(self.dtype)
            cond_i = cond[pos] if cond is not None else None
            cf_i = computed_features[pos] if computed_features is not None else None
            out.append(subs[si](scale, cond_i, None, cf_i, train))
        return out
