"""GAN training CLI (reference txt2vid/train/gan.py — same flag surface, same
reflection-driven component construction, re-targeted at the jitted train step).

Example (conditional TGANv2, cf. scripts/run_tganv2_cond.sh):
  python -m txt2vid_tpu.train.gan --G txt2vid_tpu.models.tganv2_cond.MultiScaleGen \\
      --D txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim \\
      --data config/synth.json --anno sent.pickle --vocab vocab.pickle \\
      --sent txt2vid_tpu.models.txt.Seq2Seq \\
      --frame_sizes 8 16 32 64 --subsample_input \\
      --D_loss txt2vid_tpu.gan.losses.RSGANLoss
"""

import argparse
import os

import jax

from txt2vid_tpu.utils.cache import setup_compile_cache

# Unlike the other entry points, the cache setup is DEFERRED to main():
# setup_compile_cache touches jax.default_backend(), which initializes the XLA
# backend — and jax.distributed.initialize (--multihost) must run before any
# backend touch. main() calls it right after maybe_init_distributed.

# TRAINING pins the C=1 stem to the conv formulation unless the user
# overrides: the folded (einsum) stem only wins at >=128px spatial
# (models/resnet3d.py _resolve_stem_impl), and at the one known >=128px
# TRAINING composition — the 3-scale cond-128 flagship — the einsum-stem
# D backward NaN-aborted the resume window at both seeds tried on the TPU
# backend while the conv-stem program resumed and trained at the same
# point (RESULTS.md round 8). At this shape every composition change is
# guilty until measured
# (the r3/r4 miscompile family), so the trainer defaults to the proven
# program; forward-only surfaces (sample/serve/eval) keep "auto" and its
# measured 3x 128px win.
os.environ.setdefault("TXT2VID_STEM_IMPL", "conv")

import optax

from txt2vid_tpu.config import create_object
from txt2vid_tpu.data import get_loader
from txt2vid_tpu.gan.cond_gan import CondGan
from txt2vid_tpu.gan.losses import MixedGanLoss
from txt2vid_tpu.gan.train_step import TrainConfig, build_train_step, init_state
from txt2vid_tpu.gan import trainer
from txt2vid_tpu.parallel.mesh import make_mesh, jit_train_step_sharded, \
    shard_train_state, shard_batch, prefetch_to_mesh, replicated
from txt2vid_tpu.train.setup import (setup, maybe_init_distributed,
                                     add_multihost_args, is_main_process)
from txt2vid_tpu.utils import status, warn, load_pickle, count_params
from txt2vid_tpu.utils.checkpoint import restore_state


def main(args):
    multihost = maybe_init_distributed(args)  # must precede any backend touch
    if multihost:
        if args.test:
            raise SystemExit("--test sampling is single-process; run it "
                             "without --multihost on one host")
        if args.device_data:
            raise SystemExit("--device_data + --multihost is not supported "
                             "(the HBM-resident cache is per-process); use "
                             "the host loader path")
        if args.fsdp > 1:
            raise SystemExit("--fsdp + --multihost checkpointing needs a "
                             "distributed checkpoint format (state shards are "
                             "not process-addressable); use dp/sp axes across "
                             "hosts and fsdp only single-host for now")
    setup_compile_cache()  # after distributed init: touches the backend
    seed, devices = setup(args)

    vocab = None
    if args.vocab:
        status(f"Loading vocab from {args.vocab}")
        vocab = load_pickle(args.vocab)

    txt_encoder = None
    cond_dim = 0
    if not args.dont_use_sent and vocab is not None:
        sent_spec = args.sent or "txt2vid_tpu.models.txt.Seq2Seq"
        txt_encoder = create_object(sent_spec, vocab_size=len(vocab),
                                    init_method=args.init_method)
        cond_dim = txt_encoder.encoding_size
        status(f"Sentence encode size = {cond_dim}")
    else:
        status("Not using sentence encoder")

    import jax.numpy as jnp
    model_kwargs = dict(init_method=args.init_method)
    if args.bf16:
        status("Using bfloat16 compute")
        model_kwargs["dtype"] = jnp.bfloat16
    gen = create_object(args.G, cond_dim=cond_dim, **model_kwargs)
    discrims = [create_object(d, cond_dim=cond_dim, **model_kwargs)
                for d in args.D]
    sample_mapping = create_object(args.M, **model_kwargs) if args.M else None

    gan = CondGan(gen=gen, discrims=discrims, cond_encoder=txt_encoder,
                  sample_mapping=sample_mapping, discrim_names=args.D_names,
                  discrim_lambdas=args.D_lambdas)

    if args.sgd:
        status("Using SGD")
        optD = optax.sgd(args.D_lr, momentum=args.D_beta1)
        optG = optax.sgd(args.G_lr, momentum=args.G_beta1)
    else:
        status("Using Adam")
        # --bf16 also stores the first Adam moment in bf16: the step is
        # HBM-bandwidth-bound (scripts/profile_step.py) and the moment tensors
        # are pure streaming traffic; mu tolerates low precision (it is a
        # smoothed gradient), while nu stays f32 (sqrt of tiny variances)
        mu_dtype = jnp.bfloat16 if args.bf16 else None
        if args.bf16_nu:
            # both Adam moments stored bf16 (math stays f32) — ops/optim.py
            from txt2vid_tpu.ops.optim import adam_storage
            optD = adam_storage(args.D_lr, b1=args.D_beta1, b2=args.D_beta2,
                                mu_dtype=mu_dtype, nu_dtype=jnp.bfloat16)
            optG = adam_storage(args.G_lr, b1=args.G_beta1, b2=args.G_beta2,
                                mu_dtype=mu_dtype, nu_dtype=jnp.bfloat16)
        else:
            optD = optax.adam(args.D_lr, b1=args.D_beta1, b2=args.D_beta2,
                              mu_dtype=mu_dtype)
            optG = optax.adam(args.G_lr, b1=args.G_beta1, b2=args.G_beta2,
                              mu_dtype=mu_dtype)
    if args.clip_grad:
        # global-norm gradient clipping (standard GAN stabilizer; no reference
        # counterpart — its runs rode out or died on loss spikes). Applied
        # inside the train step (TrainConfig.clip_grad) rather than as an
        # optax.chain wrapper: the opt-state structure stays identical to an
        # unclipped run (checkpoint-compatible both ways), the grad-norm
        # metric's reduction is reused, and a non-finite backward zeroes the
        # phase's update instead of poisoning the params. The chain form also
        # produced step-1 NaNs on the TPU at the 3-scale cond-128 shape that
        # the in-step form does not (RESULTS.md round 3 forensics).
        status(f"Clipping gradients to global norm {args.clip_grad}")

    status(f"Loading data from {args.data}")
    dset = create_object(args.data, vocab=vocab, anno=args.anno,
                         frame_size=args.frame_sizes[-1],
                         num_channels=args.num_channels,
                         random_frames=args.random_frames,
                         normalize=not args.uint8_input)
    local_bs = args.batch_size
    if multihost:
        pc, pi = jax.process_count(), jax.process_index()
        if args.batch_size % pc:
            raise SystemExit(f"--batch_size {args.batch_size} must divide by "
                             f"the {pc} processes")
        local_bs = args.batch_size // pc
        from txt2vid_tpu.data import ShardedView
        dset = ShardedView(dset, pi, pc)
        status(f"multihost data: process {pi} feeds {len(dset)} items, "
               f"{local_bs}/{args.batch_size} of each global batch")
    loader = get_loader(dset=dset, batch_size=local_bs, val=args.test,
                        num_workers=args.workers,
                        has_captions=args.anno is not None, seed=seed,
                        to_device=False)

    ddata = None
    if args.device_data and not args.test:
        # Device-resident dataset: upload the packed cache to HBM once; batch
        # assembly happens inside the compiled step (data/device_cache.py —
        # zero per-step H2D, and it sidesteps the axon transport's
        # every-H2D-byte host leak on long runs)
        assert not args.img_model, "--device_data supports the video path"
        assert hasattr(dset, "reader"), \
            "--device_data needs a packed dataset (txt2vid_tpu.data.packed)"
        from txt2vid_tpu.data.device_cache import DeviceVideoData
        status("Building device-resident dataset (one-time HBM upload)")
        ddata = DeviceVideoData.from_dataset(
            dset, random_phase=bool(args.random_frames))

    config = TrainConfig(
        frame_sizes=tuple(args.frame_sizes),
        subsample_input=args.subsample_input,
        discrim_steps=args.discrim_steps,
        gen_steps=args.gen_steps,
        gp_lambda=args.gp_lambda,
        gp_every=args.gp_every,
        gp_quarantine=getattr(args, "gp_quarantine", False),
        end2end=args.end2end or args.end2end_d_only,
        end2end_txt_in_g=not args.end2end_d_only,
        mean_discrim_loss=not args.no_mean_discrim_loss,
        mean_gen_loss=not args.no_mean_gen_loss,
        img_model=args.img_model,
        latent_size=gan.gen.latent_size,
        shared_gen_fwd=args.shared_gen_fwd,
        clip_grad=args.clip_grad or 0.0,
        compute_dtype=jnp.bfloat16 if getattr(args, "bf16_params", False)
        else None,
    )

    # initialize from a representative batch
    import numpy as _np
    sample_batch = ddata.host_batch(_np.arange(args.batch_size)) \
        if ddata is not None else next(iter(loader))
    if args.img_model and not args.data_is_imgs:
        sample_batch = dict(sample_batch)
        sample_batch["video"] = sample_batch["video"][:, 0]
    state = init_state(gan, jax.random.key(seed), sample_batch, optG, optD, config)

    if args.resume and not args.weights:
        from txt2vid_tpu.utils.checkpoint import latest_checkpoint
        args.weights = latest_checkpoint(args.out)
        if args.weights:
            status(f"Auto-resuming from {args.weights}")

    if args.weights:
        status(f"Loading weights from {args.weights}")
        state = restore_state(state, args.weights)

    # generator-params EMA (gan/ema.py): restore the sibling <checkpoint>.ema
    # when present; a checkpoint from a non-EMA run restarts the average from
    # its live params (inside trainer.train)
    ema = None
    if getattr(args, "g_ema", 0) and args.weights:
        from txt2vid_tpu.gan.ema import load_ema
        ema = load_ema(args.weights, state.g_vars["params"])
        if ema is not None:
            status(f"Restored generator EMA from {args.weights}.ema")

    if args.sent_weights:
        from txt2vid_tpu.utils.checkpoint import restore_txt_vars
        status(f"Loading pre-trained sentence model from {args.sent_weights}")
        state = state.replace(txt_vars=restore_txt_vars(args.sent_weights))

    n_params = count_params(state.g_vars["params"]) + sum(
        count_params(v["params"]) for v in state.d_vars)
    if state.txt_vars is not None:
        n_params += count_params(state.txt_vars["params"])
    status("GAN has %d parameters (~%.2f * 10^8)" % (n_params, n_params / 1e8))
    status(f"Dataset len= {len(loader) * args.batch_size} ({len(loader)} batches)")

    if args.G_loss is None:
        args.G_loss = args.D_loss
    losses = MixedGanLoss(g_loss=create_object(args.G_loss),
                          d_loss=create_object(args.D_loss))

    mesh = make_mesh(sp=args.sp, fsdp=args.fsdp)
    state_shardings = None
    if args.fsdp > 1:
        from txt2vid_tpu.parallel.mesh import state_sharding
        state_shardings = state_sharding(state, mesh)
    if args.sp > 1:
        # trace-time dispatch: non-local attention runs ring-sharded over the sp
        # axis (ops/ring_attention.py); everything else stays dp-sharded
        from txt2vid_tpu.ops.attention import sequence_parallel
        import contextlib
        sp_ctx = lambda: sequence_parallel(mesh, "sp")
    else:
        import contextlib
        sp_ctx = contextlib.nullcontext
    k_disp = max(args.steps_per_dispatch, 1)
    if args.clip_grad_split:
        # split-dispatch clipping (train_step.build_split_train_step): the D
        # backward, the clip math, and the update+G phase compile as three
        # separate programs — the workaround for the TPU shape where any
        # fused clip formulation miscompiles the D backward (RESULTS.md r3)
        assert k_disp == 1, "--clip_grad_split requires --steps_per_dispatch 1"
        from txt2vid_tpu.gan.train_step import build_split_train_step
        split_fns = build_split_train_step(gan, losses, optG, optD, config)
        if ddata is not None:
            from txt2vid_tpu.data.device_cache import jit_device_data_split
            jitted_raw = jit_device_data_split(
                *split_fns, ddata, mesh, args.batch_size,
                state_shardings=state_shardings)
        else:
            from txt2vid_tpu.parallel.mesh import jit_split_train_step_sharded
            jitted_raw = jit_split_train_step_sharded(
                *split_fns, mesh, state_shardings=state_shardings)
    elif ddata is not None:
        assert k_disp == 1, "--device_data implies --steps_per_dispatch 1 " \
            "(per-step dispatch cost is already zero host work)"
        from txt2vid_tpu.data.device_cache import jit_device_data_step
        step_fn = build_train_step(gan, losses, optG, optD, config)
        jitted_raw = jit_device_data_step(step_fn, ddata, mesh, args.batch_size,
                                          state_shardings=state_shardings)
    elif k_disp > 1:
        for pname in ("save_model_period", "log_period", "save_example_period"):
            period = getattr(args, pname, 0)
            if period and period % k_disp:
                warn(f"--{pname} {period} is not a multiple of "
                     f"--steps_per_dispatch {k_disp}: actions fire at the "
                     f"chunk-end iteration after the boundary (e.g. period "
                     f"{period} saves at iter {(period // k_disp + 1) * k_disp})")
        from txt2vid_tpu.parallel.mesh import jit_scanned_train_step_sharded
        step_fn = build_train_step(gan, losses, optG, optD, config)
        jitted_raw = jit_scanned_train_step_sharded(step_fn, k_disp, mesh,
                                                   state_shardings=state_shardings)
    else:
        step_fn = build_train_step(gan, losses, optG, optD, config)
        jitted_raw = jit_train_step_sharded(step_fn, mesh,
                                           state_shardings=state_shardings)

    def jitted(*a):
        with sp_ctx():
            return jitted_raw(*a)

    state = shard_train_state(state, mesh)

    def img_fix(batch):
        if args.img_model and not args.data_is_imgs:
            batch = dict(batch)
            batch["video"] = batch["video"][:, 0]
        return batch

    class LoaderAdapter:
        def __iter__(self):
            if ddata is not None:
                # host-only placeholder batches (real-sample grids / captions);
                # the compiled step draws its own on-device batch
                from txt2vid_tpu.data.device_cache import DeviceEpochIterator
                return iter(DeviceEpochIterator(ddata, args.batch_size,
                                                seed=seed))
            # async sharded placement, --prefetch batches in flight ahead of the
            # step (each device_put's H2D overlaps earlier steps' compute; deeper
            # pipelines hide more of a slow host->device transport). With
            # --steps_per_dispatch k, k batches are stacked per dispatched
            # scanned program.
            return prefetch_to_mesh(iter(loader), mesh, depth=args.prefetch,
                                    transform=img_fix, stack=k_disp)

        def __len__(self):
            if ddata is not None:
                return max(ddata.num_pairs // args.batch_size, 1)
            return len(loader) // k_disp

    if args.test:
        k_disp = 1   # sampling consumes plain batches, never scanned stacks
        trainer.test(gan=gan, state=state, num_samples=args.num_samples,
                     dataset=LoaderAdapter(), params=args, vocab=vocab, ema=ema)
    else:
        # base key placed on the mesh ONCE; the compiled step folds in its own
        # step counter, so the hot loop does no per-iteration key work at all
        from txt2vid_tpu.parallel.mesh import put_replicated_key
        base_key = put_replicated_key(jax.random.key(seed), mesh)
        try:
            trainer.train(gan=gan, state=state, train_step=jitted,
                          num_epoch=args.epochs, dataset=LoaderAdapter(),
                          params=args, vocab=vocab, seed=seed, base_key=base_key,
                          ema=ema)
        except trainer.NanAbort as e:
            # distinguishable exit for relaunch harnesses: the last checkpoint
            # on disk predates the event (poisoned states are never saved), so
            # `--resume --seed <new>` rolls back and diverges from the replay
            status(f"NAN_ABORT: {e} — exiting 42 (resume from the last "
                   f"checkpoint with a fresh --seed)")
            import sys
            sys.exit(42)


def build_parser():
    parser = argparse.ArgumentParser()
    trainer.add_params_to_parser(parser)
    add_multihost_args(parser)
    parser.add_argument('--test', action='store_true')
    parser.add_argument('--num_samples', type=int, default=1)
    parser.add_argument('--seed', type=int, default=None)
    parser.add_argument('--workers', type=int, default=2)
    parser.add_argument('--prefetch', type=int, default=3,
                        help='device-side batch prefetch depth (batches in '
                             'flight ahead of the train step)')
    parser.add_argument('--device_data', action='store_true', default=False,
                        help='upload the packed dataset to device memory once '
                             'and assemble batches inside the compiled step '
                             '(uniform-shape packed caches that fit HBM)')
    parser.add_argument('--steps_per_dispatch', type=int, default=1,
                        help='fuse k train steps into one dispatched lax.scan '
                             'program (amortizes fixed per-dispatch cost; use '
                             'periods divisible by k)')
    parser.add_argument('--frame_sizes', type=int, nargs='+', default=[64])
    parser.add_argument('--num_channels', type=int, default=1)
    parser.add_argument('--random_frames', type=int, default=0)
    parser.add_argument('--epochs', type=int, default=5)
    parser.add_argument('--batch_size', type=int, default=64)
    parser.add_argument('--init_method', type=str, default='xavier')
    parser.add_argument('--G_loss', type=str, default=None)
    parser.add_argument('--G_lr', type=float, default=0.0001)
    parser.add_argument('--G_beta1', type=float, default=0.5)
    parser.add_argument('--G_beta2', type=float, default=0.9)
    parser.add_argument('--D_loss', type=str,
                        default='txt2vid_tpu.gan.losses.VanillaGanLoss')
    parser.add_argument('--D_lr', type=float, default=0.0001)
    parser.add_argument('--D_beta1', type=float, default=0.5)
    parser.add_argument('--D_beta2', type=float, default=0.9)
    parser.add_argument('--weights', type=str, default=None)
    parser.add_argument('--resume', action='store_true', default=False,
                        help='resume from the latest checkpoint in --out (the '
                             'elastic-recovery story: relaunch with the same '
                             'command after a failure)')
    parser.add_argument('--sent_weights', type=str, default=None)
    parser.add_argument('--data', type=str, required=True)
    parser.add_argument('--anno', type=str, default=None)
    parser.add_argument('--vocab', type=str, default=None)
    parser.add_argument('--M', type=str, default=None)
    parser.add_argument('--G', type=str, required=True)
    parser.add_argument('--D', type=str, nargs='+', required=True)
    parser.add_argument('--D_names', type=str, nargs='+', default=None)
    parser.add_argument('--D_lambdas', type=float, nargs='+', default=None)
    parser.add_argument('--sent', type=str, default=None)
    parser.add_argument('--dont_use_sent', action='store_true', default=False)
    parser.add_argument('--end2end', action='store_true', default=False)
    parser.add_argument('--end2end_d_only', action='store_true', default=False,
                        help='end2end encoder updates from the D phase only: '
                             'avoids the G-phase encoder-collapse shortcut that '
                             'the reference\'s both-optimizers --end2end admits')
    parser.add_argument('--sgd', action='store_true', default=False)
    parser.add_argument('--clip_grad', type=float, default=None,
                        help='global gradient-norm clip for both optimizers')
    parser.add_argument('--clip_grad_split', action='store_true', default=False,
                        help='compile the D backward, the clip math, and the '
                             'update+G phase as THREE separate programs: the '
                             'workaround for the TPU shape where any clip '
                             'formulation fused into the D backward program '
                             'miscompiles it to NaN (RESULTS.md round 3); '
                             'costs one extra generator forward per step')
    parser.add_argument('--bf16_nu', action='store_true', default=False,
                        help='store the second Adam moment in bfloat16 as well '
                             '(HBM byte lever; update math stays f32)')
    parser.add_argument('--bf16', action='store_true', default=False,
                        help='bfloat16 compute dtype for G/D (params stay f32)')
    parser.add_argument('--bf16_params', action='store_true', default=False,
                        help='materialize one bf16 copy of the G/D params per '
                             'step and run all forwards/backwards from it '
                             '(HBM byte lever; stored params and update math '
                             'stay f32 — see TrainConfig.compute_dtype)')
    parser.add_argument('--shared_gen_fwd', action='store_true', default=False,
                        help='compute the generator forward once per step and '
                             'reuse it for both phases via jax.vjp (byte/FLOP '
                             'lever; numerically equivalent outside --end2end, '
                             'where it silently falls back)')
    parser.add_argument('--sp', type=int, default=1,
                        help='sequence-parallel mesh axis size: non-local '
                             'attention tokens ring-shard over ICI (long-clip / '
                             'high-res configs); devices = dp * sp')
    parser.add_argument('--fsdp', type=int, default=1,
                        help='fsdp mesh axis size: params, optimizer moments, '
                             'and BN stats shard across devices (ZeRO-3 — the '
                             'memory lever for models past one chip\'s HBM); '
                             'devices = dp * sp * fsdp')
    parser.add_argument('--uint8_input', action='store_true', default=True,
                        help='ship video batches as uint8, normalize on device')
    parser.add_argument('--no_uint8_input', dest='uint8_input',
                        action='store_false')
    parser.add_argument('--debug', action='store_true', default=False)
    parser.add_argument('--debug_nans', action='store_true', default=False)
    # accepted-for-compatibility flags from the reference CLI (gan.py:172-182):
    # --cuda/--ngpu are meaningless under XLA (the mesh covers all local devices;
    # reference parsed --ngpu but never used it either); --opt_level (apex AMP) maps
    # to --bf16.
    parser.add_argument('--cuda', action='store_true', default=False,
                        help=argparse.SUPPRESS)
    parser.add_argument('--ngpu', type=int, default=1, help=argparse.SUPPRESS)
    parser.add_argument('--opt_level', type=str, default='O2',
                        help=argparse.SUPPRESS)
    return parser


def cli(argv=None):
    """Console-script entry point (pyproject `txt2vid-train`)."""
    main(build_parser().parse_args(argv))


if __name__ == '__main__':
    cli()
