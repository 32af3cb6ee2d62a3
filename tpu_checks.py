"""On-TPU validation suite (run manually on hardware; the pytest suite under tests/
pins the CPU backend for reproducibility, so TPU-only paths — the Pallas kernels —
are exercised here).

Checks: fused Pallas attention vs XLA parity at model shapes, gradient flow through
the custom-VJP kernel, Attention3d module using the kernel, and a micro-benchmark.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def check_parity():
    from txt2vid_tpu.ops.attention import attention_core
    from txt2vid_tpu.ops.pallas_attention import fused_attention

    k = jax.random.key(0)
    shapes = [(2, 1024, 256, 16, 64), (4, 4096, 1024, 16, 64), (2, 1024, 256, 4, 16),
              (1, 64, 16, 16, 64)]
    for (b, n, m, d, dv) in shapes:
        kt, kp, kg = jax.random.split(jax.random.fold_in(k, n * b + d), 3)
        theta = jax.random.normal(kt, (b, n, d), jnp.float32)
        phi = jax.random.normal(kp, (b, m, d), jnp.float32)
        g = jax.random.normal(kg, (b, m, dv), jnp.float32)
        ref = np.asarray(jax.jit(attention_core)(theta, phi, g))
        out = np.asarray(jax.jit(fused_attention)(theta, phi, g))
        err = np.abs(ref - out).max()
        scale = max(np.abs(ref).max(), 1e-6)
        assert err / scale < 0.02, f"parity fail {b,n,m,d,dv}: {err}"
        print(f"  parity b={b} n={n} m={m} d={d} dv={dv}: max_err={err:.2e} ok")


def check_grads():
    from txt2vid_tpu.ops.attention import attention_core, attention_core_fused

    k = jax.random.key(1)
    kt, kp, kg = jax.random.split(k, 3)
    theta = jax.random.normal(kt, (2, 256, 16))
    phi = jax.random.normal(kp, (2, 64, 16))
    g = jax.random.normal(kg, (2, 64, 32))

    def loss_fused(t, p, gg):
        return jnp.sum(attention_core_fused(t, p, gg) ** 2)

    def loss_ref(t, p, gg):
        return jnp.sum(attention_core(t, p, gg) ** 2)

    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(theta, phi, g)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(theta, phi, g)
    for a, b, name in zip(gf, gr, "theta phi g".split()):
        err = float(jnp.abs(a - b).max())
        scale = float(jnp.abs(b).max())
        assert err / max(scale, 1e-6) < 0.02, f"grad {name} mismatch {err}"
        print(f"  grad d{name}: max_err={err:.2e} ok")

    # model-scale shape through the flash backward kernels (the (N, M) map —
    # 4096x1024 f32 = 16 MB per batch element — never hits HBM)
    kt, kp, kg = jax.random.split(jax.random.key(5), 3)
    theta = jax.random.normal(kt, (4, 4096, 16))
    phi = jax.random.normal(kp, (4, 1024, 16))
    g = jax.random.normal(kg, (4, 1024, 64))
    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(theta, phi, g)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(theta, phi, g)
    for a, b, name in zip(gf, gr, "theta phi g".split()):
        err = float(jnp.abs(a - b).max())
        scale = float(jnp.abs(b).max())
        assert err / max(scale, 1e-6) < 0.02, f"large grad {name} mismatch {err}"
        print(f"  grad(4096x1024) d{name}: max_err={err:.2e} ok")


def check_module():
    from txt2vid_tpu.models.layers import Attention3d

    x = jax.random.normal(jax.random.key(2), (2, 4, 16, 16, 32))
    mod = Attention3d(32)  # use_pallas=None -> auto (pallas on TPU)
    variables = jax.jit(lambda k, xx: mod.init(k, xx))(jax.random.key(0), x)
    out = jax.jit(lambda v, xx: mod.apply(v, xx))(variables, x)
    assert out.shape == x.shape
    print(f"  Attention3d forward on {jax.default_backend()}: {out.shape} ok")


def bench_kernel():
    from txt2vid_tpu.ops.attention import attention_core
    from txt2vid_tpu.ops.pallas_attention import fused_attention

    def timeit(f, *args, iters=50):
        jax.block_until_ready(f(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    k = jax.random.key(3)
    for (b, n, m, d, dv) in [(64, 1024, 256, 16, 64), (16, 4096, 1024, 16, 64)]:
        kt, kp, kg = jax.random.split(jax.random.fold_in(k, n), 3)
        theta = jax.random.normal(kt, (b, n, d))
        phi = jax.random.normal(kp, (b, m, d))
        g = jax.random.normal(kg, (b, m, dv))
        tx = timeit(jax.jit(attention_core), theta, phi, g)
        tp = timeit(jax.jit(fused_attention), theta, phi, g)
        print(f"  bench fwd b={b} n={n} m={m}: xla {tx:.3f}ms pallas {tp:.3f}ms "
              f"({tx / tp:.2f}x)")

        # training direction: value+grad through the flash backward vs XLA
        from txt2vid_tpu.ops.attention import attention_core_fused
        gx = jax.jit(jax.grad(lambda *a: jnp.sum(attention_core(*a) ** 2),
                              argnums=(0, 1, 2)))
        gp_ = jax.jit(jax.grad(lambda *a: jnp.sum(attention_core_fused(*a) ** 2),
                               argnums=(0, 1, 2)))
        tgx = timeit(gx, theta, phi, g, iters=20)
        tgp = timeit(gp_, theta, phi, g, iters=20)
        print(f"  bench grad b={b} n={n} m={m}: xla {tgx:.3f}ms pallas {tgp:.3f}ms "
              f"({tgx / tgp:.2f}x)")


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()} {jax.devices()}")
    if jax.default_backend() == "cpu":
        print("WARNING: no TPU — Pallas runs are skipped by the models on CPU")
    print("parity:"); check_parity()
    print("grads:"); check_grads()
    print("module:"); check_module()
    print("kernel bench:"); bench_kernel()
    print("all TPU checks passed")
