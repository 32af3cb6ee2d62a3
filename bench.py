"""Headline benchmark: G+D train steps/sec for conditional TGANv2, 16-frame 64px
(BASELINE.md north-star metric), measured on the available accelerator.

Run shape mirrors the reference's conditional run (thesis.tex:552-553: batch 40 @
64x64, frame_sizes 8/16/32/64 with the subsample pyramid, RSGAN loss, Adam
lr=2e-4 b1=0.5) with the Bi-LSTM caption encoder in the loop.

vs_baseline: the reference publishes NO step rates (BASELINE.md: baseline must be
measured, and its hardware — a GTX 1060 6GB, thesis.tex:553 — is not available
here). Instead of inventing a rate we compare against the reference hardware's
SPEED-OF-LIGHT bound: the same step costs F FLOPs (measured from the compiled
program's cost analysis, with a measured-constant fallback); a GTX 1060 at 100%
fp32 utilization (4.375 TFLOP/s) cannot exceed 4.375e12 / F steps/s. vs_baseline =
measured_steps_per_sec / that bound — a strict LOWER bound on the true speedup
(the reference's real MFU on a 6 GB part running multi-scale 3D-conv GAN training
was certainly far below 100%). The JSON line also reports effective TFLOP/s and
MFU against this chip's peak.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import time

import jax

# persistent compile cache: the first compile of the full train step can take
# minutes on a cold backend; cached recompiles are seconds
from txt2vid_tpu.utils.cache import setup_compile_cache

setup_compile_cache()  # backend-scoped (CPU runs must not pollute the TPU cache)

import jax.numpy as jnp
import numpy as np
import optax

# GTX 1060 6GB peak fp32 (boost clock): the reference's conditional-run GPU
REFERENCE_GPU_PEAK_FLOPS = 4.375e12
# measured fallback for the step cost when the backend's cost analysis is
# unavailable (XLA cost analysis of this exact program, round 1)
FLOPS_PER_STEP_FALLBACK = 782e9

# bf16 peak TFLOP/s by TPU generation (public specs); fp32 on the MXU runs at
# roughly half the bf16 rate
TPU_BF16_PEAK = {"v2": 45e12, "v3": 123e12, "v4": 275e12,
                 "v5 lite": 197e12, "v5e": 197e12, "v5p": 459e12,
                 "v6 lite": 918e12, "v6e": 918e12}

BATCH = 40
NUM_FRAMES = 16
FRAME_SIZES = (8, 16, 32, 64)
WARMUP = 3
MEASURE = 20


def probe_accelerator(timeout_s: int = 240) -> bool:
    """Fail fast when the accelerator transport is down. A wedged remote
    transport (RESULTS.md round 3: the axon link can drop mid-session, leaving
    every jax.devices() call futex-blocked forever) would otherwise make this
    process hang silently with no JSON line at all. Probe from a SUBPROCESS —
    an in-process hang cannot be recovered, a subprocess can be killed."""
    import subprocess
    import sys
    try:
        r = subprocess.run([sys.executable, "-c", "import jax; jax.devices()"],
                           timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    if not probe_accelerator():
        print(json.dumps({
            "metric": "train_steps_per_sec_per_chip_cond_tganv2_16f_64px",
            "value": 0.0, "unit": "steps/sec/chip", "vs_baseline": 0.0,
            "error": "accelerator unreachable: device probe hung/failed "
                     "(transport down — see RESULTS.md round-3 wedge forensics); "
                     "rerun when the device link is up",
        }))
        raise SystemExit(1)

    from txt2vid_tpu.gan import losses as L
    from txt2vid_tpu.gan.cond_gan import CondGan
    from txt2vid_tpu.gan.train_step import (
        TrainConfig, build_train_step, init_state_abstract)
    from txt2vid_tpu.models import tganv2_cond
    from txt2vid_tpu.models.txt import Seq2Seq
    from txt2vid_tpu.parallel.mesh import (
        make_mesh, jit_train_step_sharded, shard_batch, shard_train_state)

    import os
    # bf16 compute (f32 params) is the recommended TPU training config — the
    # step is HBM-bound and bf16 cuts activation traffic (profile_step.py);
    # training equivalence is covered by the bf16 e2e tests. BENCH_BF16=0
    # benches the f32 path.
    use_bf16 = os.environ.get("BENCH_BF16", "1") != "0"
    # byte levers (VERDICT r2 item 4), individually switchable for measurement:
    #   BENCH_REMAT_D / BENCH_REMAT_G — rematerialize block activations (trade
    #     recompute, nearly free on a 10x-idle MXU, for stored-activation HBM
    #     traffic in the backward passes)
    #   BENCH_NU_BF16 — store BOTH Adam moments bf16 (ops/optim.py adam_storage);
    #     default ON: +2.7% steps/s and capability-equivalent (12k-iter
    #     conditional run: 100% motion / 100% axis / 64.8% digit vs the bf16
    #     arm's 98.4% / 60.2% — RESULTS.md round 3)
    remat_d = os.environ.get("BENCH_REMAT_D", "0") != "0"
    remat_g = os.environ.get("BENCH_REMAT_G", "0") != "0"
    nu_bf16 = os.environ.get("BENCH_NU_BF16", "1") != "0"
    #   BENCH_SHARED_FWD — one vjp'd generator forward serves both phases
    #     (train_step.py shared_gen_fwd; gradients identical outside end2end,
    #     pinned by tests/test_train_step.py::TestSharedGenFwd). Default ON:
    #     measured +6.6% (32.03 -> 34.14 steps/s, RESULTS.md round 3).
    shared_fwd = os.environ.get("BENCH_SHARED_FWD", "1") != "0"
    #   BENCH_BF16_PARAMS — f32-master/bf16-compute params (train_step.py
    #     compute_dtype): one materialized half-width param copy per step,
    #     every forward/backward reads it, optimizer math stays f32. Default
    #     ON: measured +31.6% on hardware (34.70 -> 45.67 steps/s, round 4) —
    #     the single biggest byte lever; numerics identical to the proven
    #     per-use-cast bf16 path (tests/test_train_step.py::
    #     test_compute_dtype_copy_matches_per_use_casts). Defaults ON only
    #     when the bf16 arm is on: with BENCH_BF16=0 this must stay off or
    #     the "f32 path" bench silently runs an f32-model/bf16-compute
    #     hybrid and corrupts f32-baseline comparisons across rounds.
    bf16_params = os.environ.get(
        "BENCH_BF16_PARAMS", "1" if use_bf16 else "0") != "0"
    dtype = jnp.bfloat16 if use_bf16 else None
    vocab_size = 64
    enc = Seq2Seq(vocab_size=vocab_size)
    gen = tganv2_cond.MultiScaleGen(num_frames=NUM_FRAMES, dtype=dtype,
                                    remat=remat_g)
    discrim = tganv2_cond.MultiScaleDiscrim(dtype=dtype, remat=remat_d)
    gan = CondGan(gen=gen, discrims=[discrim], cond_encoder=enc)
    cfg = TrainConfig(frame_sizes=FRAME_SIZES, subsample_input=True, latent_size=256,
                      shared_gen_fwd=shared_fwd,
                      compute_dtype=jnp.bfloat16 if bf16_params else None)
    mu_dtype = jnp.bfloat16 if use_bf16 else None
    if nu_bf16:
        from txt2vid_tpu.ops.optim import adam_storage
        optG = adam_storage(2e-4, b1=0.5, b2=0.999, mu_dtype=mu_dtype,
                            nu_dtype=jnp.bfloat16)
        optD = adam_storage(2e-4, b1=0.5, b2=0.999, mu_dtype=mu_dtype,
                            nu_dtype=jnp.bfloat16)
    else:
        optG = optax.adam(2e-4, b1=0.5, b2=0.999, mu_dtype=mu_dtype)
        optD = optax.adam(2e-4, b1=0.5, b2=0.999, mu_dtype=mu_dtype)

    rng = np.random.default_rng(0)
    batch = {   # host numpy; placed on device exactly once via shard_batch
        "video": rng.standard_normal(
            (BATCH, NUM_FRAMES, FRAME_SIZES[-1], FRAME_SIZES[-1], 3),
            dtype=np.float32).clip(-1, 1),
        "captions": rng.integers(4, vocab_size, (BATCH, 12)).astype(np.int32),
        "lengths": np.full((BATCH,), 12, np.int32),
    }

    # abstract init (zero state, exact structure, no init executable) with
    # host-side randomization — realistic numerics without a second compile
    state = init_state_abstract(gan, jax.random.key(0), batch, optG, optD, cfg)
    r = np.random.default_rng(1)

    def rand_params(tree):
        return jax.tree_util.tree_map(
            lambda a: (r.standard_normal(a.shape).astype(a.dtype) * 0.02
                       if a.dtype == np.float32 and a.ndim >= 1 else a), tree)

    def with_params(v):
        return {**v, "params": rand_params(v["params"])}

    state = state.replace(
        g_vars=with_params(state.g_vars),
        d_vars=tuple(with_params(v) for v in state.d_vars),
        txt_vars=with_params(state.txt_vars))
    mesh = make_mesh()
    step = jit_train_step_sharded(
        build_train_step(gan, L.RSGANLoss(), optG, optD, cfg), mesh)
    state = shard_train_state(state, mesh)
    sbatch = shard_batch(batch, mesh)

    # Timing methodology: a host-side VALUE fetch is the only reliable execution
    # barrier (on remote-transport backends block_until_ready can report scheduled
    # buffers as ready). Two runs of different lengths, each ended by a loss fetch,
    # give per-step time as the slope — free of the fixed sync/RPC cost.
    # constant base key: the step folds in its own step counter on device, so the
    # measured loop does zero per-iteration host-side key dispatches (same
    # discipline as the real training loop, gan/trainer.py)
    key = jax.random.key(1)
    for i in range(WARMUP):
        state, metrics = step(state, sbatch, key)
    float(metrics["loss_g"])

    def run(n):
        nonlocal state
        t0 = time.perf_counter()
        m = None
        for i in range(n):
            state, m = step(state, sbatch, key)
        float(m["loss_g"])
        return time.perf_counter() - t0

    n_short, n_long = 5, 5 + MEASURE
    dt_short = run(n_short)
    dt_long = run(n_long)
    dt = dt_long - dt_short

    n_chips = len(jax.devices())
    steps_per_sec_per_chip = MEASURE / dt / n_chips

    # FLOPs per step from the compiled program when the backend exposes it
    flops_per_step = FLOPS_PER_STEP_FALLBACK
    flops_src = "xla_cost_analysis_round1_constant"
    try:
        ca = step.lower(state, sbatch, key).compile().cost_analysis()
        if ca and ca.get("flops", 0) > 0:
            flops_per_step = float(ca["flops"])
            flops_src = "compiled_cost_analysis"
    except Exception:
        pass

    ref_bound_steps = REFERENCE_GPU_PEAK_FLOPS / flops_per_step
    eff_flops = steps_per_sec_per_chip * flops_per_step

    kind = jax.devices()[0].device_kind.lower()
    peak = next((v for k, v in TPU_BF16_PEAK.items() if k in kind), None)
    mfu = round(eff_flops / peak, 4) if peak else None

    print(json.dumps({
        "metric": "train_steps_per_sec_per_chip_cond_tganv2_16f_64px",
        "value": round(steps_per_sec_per_chip, 4),
        "unit": "steps/sec/chip",
        # lower bound: measured rate vs the reference GPU's 100%-MFU ceiling
        "vs_baseline": round(steps_per_sec_per_chip / ref_bound_steps, 3),
        "baseline_model": "GTX1060 @ 100% fp32 MFU (speed-of-light bound, "
                          f"{ref_bound_steps:.2f} steps/s); reference published "
                          "no measured rate",
        "flops_per_step": round(flops_per_step / 1e9, 1),
        "flops_source": flops_src,
        "effective_tflops": round(eff_flops / 1e12, 2),
        "device_kind": jax.devices()[0].device_kind,
        "dtype": "bf16" if use_bf16 else "f32",
        "mfu_vs_bf16_peak": mfu,
        "levers": {"remat_d": remat_d, "remat_g": remat_g, "nu_bf16": nu_bf16,
                   "bf16_params": bf16_params,
                   "shared_fwd": shared_fwd},
    }))


if __name__ == "__main__":
    main()
