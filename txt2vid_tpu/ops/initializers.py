"""Weight initializers with reference semantics (reference txt2vid/util/torch/init.py).

The reference post-construction `init(model, method)` applies, to every Linear/Conv/
Embedding weight: xavier-normal / orthogonal / N(0, 0.02), with a sqrt(2) gain on
layers inside residual inner paths, and zeros every bias; BatchNorm is (1, 0). Here the
same policy is expressed as flax initializers chosen at module-construction time via the
`init_method` module attribute (default "xavier", matching every reference run script).
"""

import math

import jax
import jax.numpy as jnp

RESIDUAL_GAIN = math.sqrt(2.0)


def make_kernel_init(method: str = "xavier", gain: float = 1.0):
    """Return a flax kernel initializer for the given method and gain.

    xavier: N(0, gain * sqrt(2/(fan_in+fan_out)))  — torch xavier_normal_ semantics.
    ortho:  orthogonal scaled by gain.
    normal: N(0, 0.02 * gain).
    """
    if method == "xavier":
        # variance_scaling(scale, 'fan_avg', 'normal'): std = sqrt(scale / fan_avg)
        # with fan_avg = (fan_in + fan_out)/2  =>  std = gain*sqrt(2/(fan_in+fan_out))
        return jax.nn.initializers.variance_scaling(gain * gain, "fan_avg", "normal")
    if method == "ortho":
        return jax.nn.initializers.orthogonal(scale=gain)
    if method == "normal":
        return jax.nn.initializers.normal(stddev=0.02 * gain)
    raise ValueError(f"unknown init method: {method}")


def fused_gate_init(base_init, num_gates: int = 4):
    """Initializer for a fused multi-gate kernel (..., in, num_gates*C) that matches
    initializing `num_gates` separate (..., in, C) kernels — the fan-out seen by the
    base initializer is the per-gate C, not num_gates*C, so e.g. xavier std is the same
    as the reference's eight separate ConvLSTM gate convs."""

    def init(key, shape, dtype=jnp.float32):
        assert shape[-1] % num_gates == 0, shape
        per = shape[-1] // num_gates
        keys = jax.random.split(key, num_gates)
        parts = [base_init(k, shape[:-1] + (per,), dtype) for k in keys]
        return jnp.concatenate(parts, axis=-1)

    return init
