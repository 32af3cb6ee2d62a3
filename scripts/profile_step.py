"""Train-step profiling: device time vs dispatch overhead, and roofline placement.

Two measurements of the SAME compiled math (bench.py's conditional TGANv2 config):
  single — free-running per-step dispatches (what the CLI loop does);
  scanK  — K train steps fused into ONE dispatched program via lax.scan, i.e. pure
           device time with zero per-step host involvement.
The gap between them is per-step dispatch/transport overhead (large on remote
transports). Roofline: FLOPs and HBM bytes from the compiled cost analysis against
the chip's peaks decide whether the device time is MXU- or bandwidth-bound.

    python scripts/profile_step.py [--scan 10] [--bf16] [--trace out/trace]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from txt2vid_tpu.utils.cache import setup_compile_cache

setup_compile_cache()  # backend-scoped (CPU runs must not pollute the TPU cache)

import jax.numpy as jnp
import numpy as np
import optax

# v5e public peaks; fp32 MXU rate is ~half bf16
PEAKS = {"v5 lite": (197e12, 819e9), "v5e": (197e12, 819e9),
         "v4": (275e12, 1228e9), "v6 lite": (918e12, 1640e9),
         "v6e": (918e12, 1640e9), "v3": (123e12, 900e9)}

BATCH, NUM_FRAMES, FRAME_SIZES = 40, 16, (8, 16, 32, 64)


def build(dtype=None):
    from txt2vid_tpu.gan import losses as L
    from txt2vid_tpu.gan.cond_gan import CondGan
    from txt2vid_tpu.gan.train_step import (TrainConfig, build_train_step,
                                            init_state_abstract)
    from txt2vid_tpu.models import tganv2_cond
    from txt2vid_tpu.models.txt import Seq2Seq
    from txt2vid_tpu.parallel.mesh import (make_mesh, jit_train_step_sharded,
                                           shard_batch, shard_train_state,
                                           replicated, batch_sharding)

    vocab_size = 64
    enc = Seq2Seq(vocab_size=vocab_size)
    gen = tganv2_cond.MultiScaleGen(num_frames=NUM_FRAMES, dtype=dtype)
    discrim = tganv2_cond.MultiScaleDiscrim(dtype=dtype)
    gan = CondGan(gen=gen, discrims=[discrim], cond_encoder=enc)
    cfg = TrainConfig(frame_sizes=FRAME_SIZES, subsample_input=True,
                      latent_size=256)
    optG = optax.adam(2e-4, b1=0.5, b2=0.999)
    optD = optax.adam(2e-4, b1=0.5, b2=0.999)

    rng = np.random.default_rng(0)
    batch = {
        "video": rng.standard_normal(
            (BATCH, NUM_FRAMES, FRAME_SIZES[-1], FRAME_SIZES[-1], 3),
            dtype=np.float32).clip(-1, 1),
        "captions": rng.integers(4, vocab_size, (BATCH, 12)).astype(np.int32),
        "lengths": np.full((BATCH,), 12, np.int32),
    }
    state = init_state_abstract(gan, jax.random.key(0), batch, optG, optD, cfg)
    r = np.random.default_rng(1)
    rand = lambda t: jax.tree_util.tree_map(
        lambda a: (r.standard_normal(a.shape).astype(a.dtype) * 0.02
                   if a.dtype == np.float32 and a.ndim >= 1 else a), t)
    state = state.replace(
        g_vars={**state.g_vars, "params": rand(state.g_vars["params"])},
        d_vars=tuple({**v, "params": rand(v["params"])} for v in state.d_vars),
        txt_vars={**state.txt_vars, "params": rand(state.txt_vars["params"])})

    mesh = make_mesh()
    step_fn = build_train_step(gan, L.RSGANLoss(), optG, optD, cfg)
    single = jit_train_step_sharded(step_fn, mesh)
    state = shard_train_state(state, mesh)
    sbatch = shard_batch(batch, mesh)
    return step_fn, single, state, sbatch, mesh


def make_scan(step_fn, k, mesh):
    from txt2vid_tpu.parallel.mesh import replicated, batch_sharding
    from jax.sharding import NamedSharding, PartitionSpec as P

    def multi(state, batch, key):
        def body(st, _):
            st, m = step_fn(st, batch, key)   # step folds in its own counter
            return st, (m["loss_d"], m["loss_g"])
        return jax.lax.scan(body, state, None, length=k)

    rep = NamedSharding(mesh, P())
    bs = NamedSharding(mesh, P("dp"))
    return jax.jit(multi, in_shardings=(rep, bs, rep),
                   out_shardings=(rep, (rep, rep)), donate_argnums=(0,))


def timed(run, n_short, n_long):
    dt_s = run(n_short)
    dt_l = run(n_long)
    return (dt_l - dt_s) / (n_long - n_short)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan", type=int, default=10)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--trace", default=None, help="jax.profiler trace dir")
    args = ap.parse_args()

    dtype = jnp.bfloat16 if args.bf16 else None
    step_fn, single, state, sbatch, mesh = build(dtype)
    key = jax.random.key(1)

    # ---- single-dispatch loop (the CLI's shape)
    st = state
    for _ in range(3):
        st, m = single(st, sbatch, key)
    float(m["loss_g"])

    def run_single(n):
        nonlocal st
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            st, m = single(st, sbatch, key)
        float(m["loss_g"])
        return time.perf_counter() - t0

    t_single = timed(run_single, 5, 25)

    # ---- K steps per dispatch (pure device time)
    scank = make_scan(step_fn, args.scan, mesh)
    st2, (ld, lg) = scank(st, sbatch, key)
    float(lg[-1])

    def run_scan(n):
        nonlocal st2
        t0 = time.perf_counter()
        lg = None
        for _ in range(n):
            st2, (ld, lg) = scank(st2, sbatch, key)
        float(lg[-1])
        return time.perf_counter() - t0

    t_scan = timed(run_scan, 2, 6) / args.scan

    if args.trace:
        try:
            with jax.profiler.trace(args.trace):
                st2, (ld, lg) = scank(st2, sbatch, key)
                float(lg[-1])
            trace_status = f"written to {args.trace}"
        except Exception as e:
            trace_status = f"unavailable: {e}"
    else:
        trace_status = "not requested"

    # ---- roofline from the compiled single-step program
    flops = bytes_ = None
    try:
        ca = single.lower(state, sbatch, key).compile().cost_analysis()
        flops = float(ca.get("flops", 0)) or None
        bytes_ = float(ca.get("bytes accessed", 0)) or None
    except Exception:
        pass

    kind = jax.devices()[0].device_kind
    peak_flops, peak_bw = next(
        (v for k, v in PEAKS.items() if k in kind.lower()), (None, None))
    report = {
        "device_kind": kind,
        "dtype": "bf16" if args.bf16 else "f32",
        "sec_per_step_single_dispatch": round(t_single, 5),
        "sec_per_step_scan%d" % args.scan: round(t_scan, 5),
        "dispatch_overhead_ms_per_step": round((t_single - t_scan) * 1e3, 2),
        "steps_per_sec_device": round(1.0 / t_scan, 2),
        "flops_per_step": flops,
        "bytes_per_step": bytes_,
        "trace": trace_status,
    }
    if flops and peak_flops:
        report["mfu_vs_bf16_peak"] = round(flops / t_scan / peak_flops, 4)
        report["compute_bound_ms"] = round(flops / peak_flops * 1e3, 3)
    if bytes_ and peak_bw:
        report["hbm_util"] = round(bytes_ / t_scan / peak_bw, 4)
        report["bandwidth_bound_ms"] = round(bytes_ / peak_bw * 1e3, 3)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
