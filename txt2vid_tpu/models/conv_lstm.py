"""ConvLSTM temporal core (reference txt2vid/models/conv_lstm.py), scan-based.

Reference semantics preserved:
  * gates i/f/c/o from input conv (with bias) + hidden conv (no bias), 3x3;
  * the input is fed only at t=0 and zeros afterwards (conv_lstm.py:78-79);
  * hidden/cell state start at zero;
  * the reference's peephole weights Wci/Wcf/Wco are created as all-zero buffers that
    are never trained (conv_lstm.py:46-49), so the peephole terms are identically
    zero — they are omitted here (mathematically identical).

TPU re-design: the Python 16-iteration unroll becomes a single `lax.scan`; the eight
per-gate convs are fused into one 4C-channel conv each for input and hidden (init
matches eight separate convs via fused_gate_init); and since the input is zero for
t > 0, the input conv runs ONCE — steps t > 0 see only its bias, halving the LSTM's
conv FLOPs vs a literal translation.
"""

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from txt2vid_tpu.ops.initializers import make_kernel_init, fused_gate_init


def _lstm_gates(gates, c):
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
    h_new = nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


class _GateConv(nn.Module):
    """SAME conv with the nn.Conv parameter layout, specialized for the 1x1-spatial
    latent plane of 64px TGANv2 configs: with h = w = 1 every non-center tap of a 3x3
    SAME conv sees only zero padding, so the op collapses to a dense matmul with the
    kernel's center tap — identical math, 9x fewer FLOPs in the LSTM hot loop."""

    features: int
    kernel_size: Sequence[int]
    use_bias: bool = True
    kernel_init: Any = nn.initializers.lecun_normal()
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,)) \
            if self.use_bias else None
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = None if bias is None else bias.astype(self.dtype)
        if x.shape[1] == 1 and x.shape[2] == 1:
            y = jnp.einsum("bhwc,cf->bhwf", x, kernel[kh // 2, kw // 2],
                           preferred_element_type=x.dtype)
        else:
            y = jax.lax.conv_general_dilated(
                x, kernel, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if bias is not None:
            y = y + bias
        return y


class _StackStep(nn.Module):
    """One timestep over the full layer stack. carry = list of (h, c) per layer;
    input = layer-0 precomputed input-gate contribution for this step."""

    hidden_channels: Sequence[int]
    kernel_size: int = 3
    init_method: str = "xavier"
    dtype: Any = None

    @nn.compact
    def __call__(self, carry, gx0_t):
        k = (self.kernel_size, self.kernel_size)
        new_carry = []
        x = None
        for li, hc in enumerate(self.hidden_channels):
            h, c = carry[li]
            ki = fused_gate_init(make_kernel_init(self.init_method))
            if li == 0:
                gates = gx0_t
            else:
                gates = _GateConv(4 * hc, k, kernel_init=ki, dtype=self.dtype,
                                  name=f"wx{li}")(x)
            gates = gates + _GateConv(4 * hc, k, use_bias=False, kernel_init=ki,
                                      dtype=self.dtype, name=f"wh{li}")(h)
            h_new, c_new = _lstm_gates(gates, c)
            new_carry.append((h_new, c_new))
            x = h_new
        return new_carry, x


class ConvLSTM(nn.Module):
    """Unrolls `step` timesteps from a single input plane (reference conv_lstm.py:57-97).

    x: (B, h, w, C) -> (B, step, h, w, hidden_channels[-1]) — all steps are effective
    (the reference generators use effective_step=range(num_frames), tganv2/gen.py:45).
    """

    hidden_channels: Sequence[int]
    kernel_size: int = 3
    step: int = 16
    init_method: str = "xavier"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        hc0 = self.hidden_channels[0]
        k = (self.kernel_size, self.kernel_size)
        ki = fused_gate_init(make_kernel_init(self.init_method))

        # Layer-0 input-gate sequence: the real conv at t=0, bias-only afterwards.
        wx_bias = self.param("wx0_bias", nn.initializers.zeros, (4 * hc0,))
        gx0 = _GateConv(4 * hc0, k, use_bias=False, kernel_init=ki, dtype=self.dtype,
                        name="wx0")(x) + wx_bias.astype(x.dtype)
        bias_plane = jnp.broadcast_to(wx_bias.astype(x.dtype),
                                      (self.step - 1, b, h, w, 4 * hc0))
        gx_seq = jnp.concatenate([gx0[None], bias_plane], axis=0)

        carry = [
            (jnp.zeros((b, h, w, hc), x.dtype), jnp.zeros((b, h, w, hc), x.dtype))
            for hc in self.hidden_channels
        ]

        scan = nn.scan(
            _StackStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0, out_axes=0,
        )(self.hidden_channels, self.kernel_size, self.init_method, self.dtype,
          name="cells")
        _, hs = scan(carry, gx_seq)              # (step, B, h, w, hc_last)
        return jnp.moveaxis(hs, 0, 1)            # (B, step, h, w, hc_last)
