"""Ring attention vs single-device reference, on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from txt2vid_tpu.ops.attention import attention_core
from txt2vid_tpu.ops.ring_attention import ring_attention


def test_ring_matches_reference():
    n_dev = 8
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("sp",))
    b, n, m, d, dv = 2, 64, 32, 8, 16  # n, m divisible by 8

    k = jax.random.key(0)
    kt, kp, kg = jax.random.split(k, 3)
    theta = jax.random.normal(kt, (b, n, d), jnp.float32)
    phi = jax.random.normal(kp, (b, m, d), jnp.float32)
    g = jax.random.normal(kg, (b, m, dv), jnp.float32)

    expected = np.asarray(attention_core(theta, phi, g))

    sh = NamedSharding(mesh, P(None, "sp", None))
    theta_s = jax.device_put(theta, sh)
    phi_s = jax.device_put(phi, sh)
    g_s = jax.device_put(g, sh)

    out = jax.jit(lambda t, p, gg: ring_attention(t, p, gg, mesh))(theta_s, phi_s, g_s)
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-5)


def test_ring_under_full_jit_with_grad():
    n_dev = 4
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("sp",))
    b, n, m, d, dv = 1, 16, 8, 4, 4

    k = jax.random.key(1)
    kt, kp, kg = jax.random.split(k, 3)
    theta = jax.random.normal(kt, (b, n, d))
    phi = jax.random.normal(kp, (b, m, d))
    g = jax.random.normal(kg, (b, m, dv))

    def loss_ring(t, p, gg):
        return jnp.sum(ring_attention(t, p, gg, mesh) ** 2)

    def loss_ref(t, p, gg):
        return jnp.sum(attention_core(t, p, gg) ** 2)

    gr = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(theta, phi, g)
    ge = jax.grad(loss_ref, argnums=(0, 1, 2))(theta, phi, g)
    for a, e in zip(gr, ge):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=2e-4)
