"""Host-side training loop (reference txt2vid/gan/trainer.py train()/test()).

The device-side hot loop lives in gan/train_step.py as one compiled program; this
module drives epochs/batches, reproduces the reference's telemetry (rolling-average
sec/iter and sec/batch-load per log period, trainer.py:281-288), checkpoint cadence
with loss-encoded filenames (trainer.py:269-279), and periodic sample grids
(trainer.py:290-324, save_frames flattens (B,T,H,W,C) into an image grid with one row
per video)."""

import argparse
from collections import deque

import numpy as np
import jax

from txt2vid_tpu.utils import RollingAvg, Stopwatch, status, ensure_exists
from txt2vid_tpu.utils.checkpoint import checkpoint_name, save_state, AsyncCheckpointer


class NanAbort(RuntimeError):
    """Raised by train() when fetched metrics show the run is poisoned or a
    phase is frozen: a non-finite loss (params already NaN — nothing after it
    is useful work), a non-finite grad norm with no clip guard (the update
    that poisoned the params), a long unbroken streak of non-finite grad
    norms under --clip_grad (the guard is zeroing EVERY update, i.e. that
    phase is silently frozen — the queue-16 failure mode, RESULTS.md round 3),
    or a sustained non-finite RATE within a trailing window (the lazy-GP
    lock-in under --gp_every k, where only every k-th step is poisoned so no
    consecutive streak ever forms — the r4_cond128 take-6 failure mode).

    Detection happens in the metric drain, which runs before every periodic
    checkpoint save, so a poisoned state is never written: the latest
    checkpoint on disk is always from before the event, and the relaunch
    harness can resume from it with a fresh seed (scripts/r3_queue18.sh)."""

    def __init__(self, iteration: int, what: str):
        self.iteration = iteration
        self.what = what
        super().__init__(f"non-finite {what} at iteration {iteration}")


def add_params_to_parser(parser: argparse.ArgumentParser):
    """Engine flags (reference trainer.py:15-42 surface)."""
    parser.add_argument('--data_is_imgs', action='store_true', default=False)
    parser.add_argument('--img_model', action='store_true', default=False)
    parser.add_argument('--log_period', type=int, default=20)
    parser.add_argument('--loss_window_size', type=int, default=20)
    parser.add_argument('--no_mean_discrim_loss', action='store_false', default=True)
    parser.add_argument('--no_mean_gen_loss', action='store_false', default=True)
    parser.add_argument('--sample_batch_size', type=int, default=None)
    parser.add_argument('--discrim_steps', type=int, default=1)
    parser.add_argument('--gen_steps', type=int, default=1)
    parser.add_argument('--gp_lambda', type=float, default=-1)
    parser.add_argument('--gp_every', type=int, default=1,
                        help='lazy GP regularization: apply the gradient penalty '
                             'only every k-th step with its weight scaled by k '
                             '(StyleGAN2-style; 1 = reference every-step behavior)')
    parser.add_argument('--gp_quarantine', action='store_true', default=False,
                        help='compute the GP term\'s gradient as a separate vjp '
                             'and zero only ITS non-finite leaves, keeping the '
                             'main-loss D gradient — one poisoned GP '
                             'double-backward costs a step\'s regularization, '
                             'not the run (TrainConfig.gp_quarantine); '
                             'quarantined steps are counted in the status line')
    parser.add_argument('--save_initial', action='store_true', default=False)
    parser.add_argument('--save_initial_examples', action='store_true', default=False)
    parser.add_argument('--save_model_period', type=int, default=100)
    parser.add_argument('--save_example_period', type=int, default=100)
    parser.add_argument('--use_writer', action='store_true', default=False)
    parser.add_argument('--out', type=str, default='out')
    parser.add_argument('--out_samples', type=str, default='out_samples')
    parser.add_argument('--subsample_input', action='store_true', default=False)
    parser.add_argument('--host_snapshot', action='store_true', default=False,
                        help='checkpoint snapshots pull to host synchronously '
                             '(zero extra HBM) instead of an on-device copy — '
                             'use for models near HBM capacity')
    parser.add_argument('--rss_limit_gb', type=float, default=100.0,
                        help='end training cleanly (final checkpoint, resumable) '
                             'if process RSS exceeds this — the axon transport '
                             'retains every H2D byte on the host (RESULTS.md r3), '
                             'so streaming-input runs grow without bound; '
                             '0 disables')
    parser.add_argument('--no_nan_abort', dest='nan_abort',
                        action='store_false', default=True,
                        help='disable aborting (exit 42) when fetched metrics '
                             'show a poisoned run: non-finite loss, unclipped '
                             'non-finite grad norm, or a frozen clipped phase')
    parser.add_argument('--nan_abort_streak', type=int, default=100,
                        help='with --clip_grad, abort after this many '
                             'CONSECUTIVE non-finite grad norms in one phase '
                             '(the guard zeroing every update = frozen phase)')
    parser.add_argument('--nan_abort_window', type=int, default=200,
                        help='with --clip_grad, also abort when '
                             '--nan_abort_window_count non-finite grad norms '
                             'land within this many trailing steps of one '
                             'phase. Catches the lazy-GP (--gp_every k) '
                             'lock-in, where only every k-th step is poisoned '
                             'so the CONSECUTIVE streak never forms '
                             '(r4_cond128 take 6 zombie-walked 1000+ iters '
                             'this way); 0 disables')
    parser.add_argument('--nan_abort_window_count', type=int, default=20,
                        help='non-finite fetches within --nan_abort_window '
                             'steps that trigger the abort (isolated '
                             'absorbed spikes stay well below this)')
    parser.add_argument('--g_ema', type=float, default=0.0,
                        help='decay for an exponential moving average of the '
                             'generator params (e.g. 0.999), sampled alongside '
                             'the live generator and saved as a sibling '
                             '<checkpoint>.ema file (gan/ema.py). 0 disables '
                             '(the reference behavior — it has no EMA)')
    return parser


def to_grid(video_batch: np.ndarray) -> np.ndarray:
    """(B, T, H, W, C) in [-1,1] -> uint8 grid image, one row per video."""
    v = np.asarray(video_batch)
    if v.ndim == 4:  # images -> single-frame videos
        v = v[:, None]
    b, t, h, w, c = v.shape
    if v.dtype != np.uint8:  # [-1, 1] floats; uint8 passes through
        v = ((np.clip(v, -1, 1) + 1.0) * 127.5).astype(np.uint8)
    pad = 2
    grid = np.zeros((b * (h + pad) + pad, t * (w + pad) + pad, c), np.uint8)
    for i in range(b):
        for j in range(t):
            y, x = pad + i * (h + pad), pad + j * (w + pad)
            grid[y:y + h, x:x + w] = v[i, j]
    return grid


def save_frames(video_batch, path: str):
    from PIL import Image
    grid = to_grid(video_batch)
    if grid.shape[-1] == 1:
        grid = grid[..., 0]
    Image.fromarray(grid).save(path)


def save_sentences(captions, path: str, vocab=None):
    with open(path, "w") as f:
        for cap in np.asarray(captions):
            f.write(vocab.to_words(cap) + "\n")


_jit_cache = {}


def _jitted_sample(gan, has_cond):
    key = (id(gan), has_cond)
    if key not in _jit_cache:
        if has_cond:
            fn = lambda g_vars, z, cond: gan.gen.apply(g_vars, z, cond=cond,
                                                       train=False)
        else:
            fn = lambda g_vars, z: gan.gen.apply(g_vars, z, train=False)
        _jit_cache[key] = jax.jit(fn)
    return _jit_cache[key]


def _jitted_encode(gan):
    key = (id(gan), "encode")
    if key not in _jit_cache:
        _jit_cache[key] = jax.jit(
            lambda txt_vars, caps, lens: gan.encode(txt_vars, caps, lens))
    return _jit_cache[key]


def sample(gan, state, batch_size: int, key, cond=None, g_vars=None):
    """Eval-mode generation (reference trainer.py:44-90 test pathway): running-stat
    BN, no subsampling, final scale only. `g_vars` overrides the live generator
    variables (e.g. with EMA params swapped in, gan/ema.py)."""
    if g_vars is None:
        g_vars = state.g_vars
    z = jax.random.normal(key, (batch_size, gan.gen.latent_size))
    if cond is not None:
        out = _jitted_sample(gan, True)(g_vars, z, cond)
    else:
        out = _jitted_sample(gan, False)(g_vars, z)
    return out if isinstance(out, (list, tuple)) else [out]


def test(gan=None, state=None, num_samples=1, dataset=None, params=None, vocab=None,
         ema=None):
    """Sampling mode (reference trainer.py:44-90; its inner dataset loop broke
    after one batch so every round re-sampled the same data — here each of the
    `num_samples` rounds consumes a fresh batch, wrapping the epoch if needed,
    and outputs are named consistently per round: real_{i}.png, sentences_{i}.txt,
    fake_{i}_{H}x{W}.jpg). With `ema` (an EMA params tree, gan/ema.py) each
    round also writes fake_ema_{i}_{H}x{W}.jpg from the averaged generator."""
    ensure_exists(params.out_samples)
    key = jax.random.key(getattr(params, "seed", 0) or 0)
    it = iter(dataset)
    for i in range(num_samples):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(dataset)
            batch = next(it)
        x = np.asarray(batch["video"])
        cond = None
        if gan.cond_encoder is not None and "captions" in batch:
            cond = _jitted_encode(gan)(state.txt_vars, batch["captions"],
                                       batch["lengths"])
        key, k = jax.random.split(key)
        fakes = sample(gan, state, x.shape[0], k, cond=cond)
        save_frames(x, f"{params.out_samples}/real_{i}.png")
        if cond is not None and vocab is not None:
            save_sentences(batch["captions"],
                           f"{params.out_samples}/sentences_{i}.txt", vocab)
        for f in fakes:
            h, w = f.shape[-3], f.shape[-2]
            path = f"{params.out_samples}/fake_{i}_{h}x{w}.jpg"
            status(f"saving to {path}")
            save_frames(np.asarray(f), path)
        if ema is not None:
            from txt2vid_tpu.gan.ema import with_ema_params
            key, k = jax.random.split(key)
            for f in sample(gan, state, x.shape[0], k, cond=cond,
                            g_vars=with_ema_params(state.g_vars, ema)):
                h, w = f.shape[-3], f.shape[-2]
                save_frames(np.asarray(f),
                            f"{params.out_samples}/fake_ema_{i}_{h}x{w}.jpg")


def train(gan=None, state=None, train_step=None, num_epoch=None, dataset=None,
          params=None, vocab=None, seed: int = 0, on_iteration=None,
          base_key=None, ema=None):
    """Epoch loop (reference trainer.py:111-333). `train_step` is the compiled step
    from gan/train_step.py; `dataset` yields device-ready batch dicts. `base_key`
    (optionally pre-placed on the mesh) is passed to the step UNCHANGED every
    iteration — the step folds in its own step counter, so the hot loop performs
    zero per-iteration host-side key operations."""
    # Multi-host: every process runs the SAME loop (the metric drain and the
    # NaN-abort must fire consistently — the step's metrics are replicated, so
    # every process sees identical values and aborts in lockstep), but only
    # process 0 owns host-side artifacts: checkpoint writes, the metrics
    # writer, and sample dumps (train/setup.py is_main_process).
    is_main = jax.process_index() == 0
    multihost = jax.process_count() > 1
    ensure_exists(params.out)
    ensure_exists(params.out_samples)

    writer = None
    if getattr(params, "use_writer", False) and is_main:
        from txt2vid_tpu.utils.writer import MetricsWriter
        writer = MetricsWriter(params.out)

    gen_loss = RollingAvg(params.loss_window_size)
    discrim_loss = RollingAvg(params.loss_window_size)
    gnorm_d = RollingAvg(params.loss_window_size)
    gnorm_g = RollingAvg(params.loss_window_size)
    nonfinite_gnorm = {"d": 0, "g": 0}  # run totals, surfaced in the status line
    gp_quarantined = [0]                # run total of zeroed GP-gradient leaves
    avg_data_load = RollingAvg(params.log_period)
    avg_iter = RollingAvg(params.log_period)
    data_watch, iter_watch = Stopwatch(), Stopwatch()

    key = jax.random.key(seed)
    if base_key is None:
        base_key = jax.random.fold_in(key, 0x5eed)
    iteration = int(state.step)

    snapshot = "host" if getattr(params, "host_snapshot", False) else "device"
    checkpointer = AsyncCheckpointer(snapshot=snapshot)

    k_step = getattr(params, "steps_per_dispatch", 1) or 1
    # generator-params EMA (gan/ema.py): its own jitted lerp AFTER the step —
    # the train-step program is byte-identical with EMA on or off, and the EMA
    # tree checkpoints as a sibling <checkpoint>.ema file via its own
    # (one-slot) async checkpointer
    ema_decay = getattr(params, "g_ema", 0.0) or 0.0
    ema_update = ema_checkpointer = None
    if ema_decay:
        from txt2vid_tpu.gan import ema as ema_mod
        if ema is None:
            ema = ema_mod.init_ema(state.g_vars["params"])
        ema_update = ema_mod.make_ema_update(ema_decay, k_step)
        ema_checkpointer = AsyncCheckpointer(snapshot=snapshot)

        def save_checkpoint(st, path):
            checkpointer.save(st, path)
            ema_checkpointer.save(ema, ema_mod.ema_path(path))
    else:
        def save_checkpoint(st, path):
            checkpointer.save(st, path)
    if not is_main:
        # non-main processes skip the device->host snapshot entirely; state
        # leaves are replicated (dp/sp meshes), so process 0's copy is complete
        def save_checkpoint(st, path):  # noqa: F811
            pass

    # Metrics are left on device until a log/save boundary: a host value fetch is a
    # device sync (expensive per-step on remote transports), and the train step must
    # stay free-running (the reference's equivalent cost, float(loss) per iteration,
    # was hidden by CUDA's cheap D2H path).
    pending = []  # (iteration, device_metrics)

    nan_abort = getattr(params, "nan_abort", True)
    clip_on = bool(getattr(params, "clip_grad", 0) or 0)
    abort_streak = getattr(params, "nan_abort_streak", 100) or 0
    gnorm_streak = {"d": 0, "g": 0}  # CONSECUTIVE non-finite fetches per phase
    # Windowed rate detector: under --gp_every k only GP steps are poisoned in
    # the lock-in mode, so the consecutive streak resets every k-th step and
    # never fires; a sustained ~1/k non-finite RATE is the signature instead.
    abort_window = getattr(params, "nan_abort_window", 200) or 0
    abort_window_count = getattr(params, "nan_abort_window_count", 20) or 0
    nonfinite_recent = {"d": deque(), "g": deque()}  # sub_it of recent events

    def _window_check(phase, sub_it, label):
        # the deque also feeds the checkpoint burst guard, so it is
        # maintained even when the windowed abort itself is disabled
        rec = nonfinite_recent[phase]
        rec.append(sub_it)
        horizon = max(abort_window, 100)
        while rec and rec[0] <= sub_it - horizon:
            rec.popleft()
        if not (abort_window and abort_window_count):
            return
        n = sum(1 for s in rec if s > sub_it - abort_window)
        if nan_abort and clip_on and n >= abort_window_count:
            _abort(sub_it, "%s grad norm %d times within the last %d steps — "
                   "sustained poisoning under the clip guard (lazy-GP "
                   "lock-in: that phase's regularized steps are all frozen)"
                   % (label, n, abort_window))

    def _abort(sub_it, what):
        # drain_pending runs before every periodic checkpoint save, so the
        # poisoned state is never on disk; flush the healthy async saves that
        # are already in flight, then unwind (train/gan.py exits 42 so the
        # relaunch harness can resume from the last good checkpoint)
        status(f"NAN_ABORT: non-finite {what} at iteration {sub_it}")
        checkpointer.wait()
        if writer is not None:
            writer.close()
        raise NanAbort(sub_it, what)

    def drain_pending():
        if not pending:
            return
        # ONE batched transfer for all pending metrics (per-value fetches are a
        # round-trip each on remote transports)
        host = jax.device_get([m for _, m in pending])
        for (it, _), m in zip(pending, host):
            # scanned multi-step programs return metrics stacked (k,) in step
            # order; it is the iteration of the LAST step in the chunk
            ld_arr = np.atleast_1d(np.asarray(m["loss_d"], np.float64))
            lg_arr = np.atleast_1d(np.asarray(m["loss_g"], np.float64))
            has_gd, has_gg = "grad_norm_d" in m, "grad_norm_g" in m
            gd_arr = np.atleast_1d(np.asarray(
                m.get("grad_norm_d", np.nan), np.float64))
            gg_arr = np.atleast_1d(np.asarray(
                m.get("grad_norm_g", np.nan), np.float64))
            for j, (ld, lg) in enumerate(zip(ld_arr, lg_arr)):
                sub_it = it - (len(ld_arr) - 1 - j)
                discrim_loss.update(float(ld))
                gen_loss.update(float(lg))
                if nan_abort and not (np.isfinite(ld) and np.isfinite(lg)):
                    _abort(sub_it, "loss (params are poisoned)")
                if has_gd and j < len(gd_arr):
                    if np.isfinite(gd_arr[j]):
                        gnorm_d.update(float(gd_arr[j]))
                        gnorm_streak["d"] = 0
                    else:
                        nonfinite_gnorm["d"] += 1
                        gnorm_streak["d"] += 1
                        if nan_abort and not clip_on:
                            _abort(sub_it, "discriminator grad norm with no "
                                           "--clip_grad guard (the update "
                                           "poisons the params)")
                        if (nan_abort and abort_streak
                                and gnorm_streak["d"] >= abort_streak):
                            _abort(sub_it, "discriminator grad norm %d times "
                                   "consecutively — the clip guard is zeroing "
                                   "every D update (frozen phase)"
                                   % gnorm_streak["d"])
                        _window_check("d", sub_it, "discriminator")
                if has_gg and j < len(gg_arr):
                    if np.isfinite(gg_arr[j]):
                        gnorm_g.update(float(gg_arr[j]))
                        gnorm_streak["g"] = 0
                    else:
                        nonfinite_gnorm["g"] += 1
                        gnorm_streak["g"] += 1
                        if nan_abort and not clip_on:
                            _abort(sub_it, "generator grad norm with no "
                                           "--clip_grad guard (the update "
                                           "poisons the params)")
                        if (nan_abort and abort_streak
                                and gnorm_streak["g"] >= abort_streak):
                            _abort(sub_it, "generator grad norm %d times "
                                   "consecutively — the clip guard is zeroing "
                                   "every G update (frozen phase)"
                                   % gnorm_streak["g"])
                        _window_check("g", sub_it, "generator")
                if "gp_quarantined" in m:
                    gq_arr = np.atleast_1d(np.asarray(m["gp_quarantined"]))
                    if j < len(gq_arr):
                        gp_quarantined[0] += int(gq_arr[j])
                        if writer is not None and int(gq_arr[j]):
                            writer.add_scalar("gp_quarantined",
                                              int(gq_arr[j]), sub_it)
                if writer is not None:
                    writer.add_scalar("loss/discrim", float(ld), sub_it)
                    writer.add_scalar("loss/gen", float(lg), sub_it)
                    if j < len(gd_arr):
                        writer.add_scalar("grad_norm/discrim",
                                          float(gd_arr[j]), sub_it)
                        writer.add_scalar("grad_norm/gen",
                                          float(gg_arr[j]), sub_it)
        pending.clear()

    def rss_gb():
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmRSS"):
                        return int(line.split()[1]) / 1e6
        except OSError:
            pass
        return 0.0

    rss_limit = getattr(params, "rss_limit_gb", 0) or 0
    stop = False
    for epoch in range(num_epoch):
        if stop:
            break
        if params.log_period > 0:
            status(f"Epoch {epoch + 1} started")
        data_watch.start()
        iter_watch.start()
        for i, batch in enumerate(dataset):
            avg_data_load.update(data_watch.stop() / k_step)
            iteration += k_step

            state, metrics = train_step(state, batch, base_key)
            if ema_update is not None:
                ema = ema_update(ema, state.g_vars["params"])
            pending.append((iteration, metrics))
            if len(pending) >= 512:
                # bound the pending-metrics buffer even when every cadence is
                # disabled (log/save periods 0) — otherwise device scalars
                # accumulate for the whole run
                drain_pending()

            # cadence checks fire when the period boundary falls inside this
            # chunk of k_step iterations (== 0 for the k_step == 1 case)
            first = iteration <= k_step
            if (first and params.save_initial) or (
                    params.save_model_period > 0
                    and iteration % params.save_model_period < k_step
                    and iteration >= params.save_model_period):
                drain_pending()
                # burst guard: a non-finite BURST in progress (several events
                # in the trailing 100 steps, below the abort threshold) means
                # this state is mid-onset — skip the save rather than write a
                # contaminated checkpoint (take-6's iter_11000 was saved with
                # 6 recent zeroed D updates and a drifting Adam nu; rollback
                # then has to reach 1000 iters further back)
                burst = any(sum(1 for s in rec if s > iteration - 100) >= 3
                            for rec in nonfinite_recent.values())
                if burst:
                    status(f"skipping checkpoint at iteration {iteration}: "
                           "non-finite burst in progress (state mid-onset)")
                else:
                    name = checkpoint_name(iteration, gen_loss.get(),
                                           discrim_loss.get())
                    save_checkpoint(state, f"{params.out}/{name}")

            if rss_limit and iteration % 100 < k_step and rss_gb() > rss_limit:
                status(f"RSS {rss_gb():.1f} GB exceeds --rss_limit_gb "
                       f"{rss_limit}: ending cleanly (resume with --resume)")
                stop = True
                break

            if params.log_period > 0 and iteration % params.log_period < k_step:
                drain_pending()
                # a non-finite norm means that phase's update was ZEROED by
                # --clip_grad (or would have poisoned the params without it) —
                # say so loudly instead of omitting the |g| chunk: a frozen
                # phase must not look like a pre-metrics log format (the
                # queue-16 frozen-discriminator run hid exactly this way,
                # RESULTS.md round 3)
                def _gfmt(name, avg, bad):
                    if len(avg) == 0 and bad == 0:
                        return ""
                    s = " |g|%s: %s" % (name,
                                        "%.2f" % avg.get() if len(avg) else "-")
                    if bad:
                        s += " (%d non-finite!)" % bad
                    return s
                gn = (_gfmt("D", gnorm_d, nonfinite_gnorm["d"])
                      + _gfmt("G", gnorm_g, nonfinite_gnorm["g"]))
                if gp_quarantined[0]:
                    gn += " GPq: %d" % gp_quarantined[0]
                status("[%d/%d; %d/%d] - Iter %d, Loss_D: %.4f Loss_G: %.4f%s - "
                       "%.4f sec/iter; %.4f sec/batch load" % (
                           epoch, num_epoch, i, len(dataset), iteration,
                           discrim_loss.get(), gen_loss.get(), gn,
                           avg_iter.get(), avg_data_load.get()))

            if multihost and params.save_example_period > 0 and first:
                status("multihost: in-loop sample dumps disabled (batches are "
                       "host-sharded); sample offline from checkpoints via "
                       "txt2vid_tpu.sample")
            if params.save_example_period > 0 and not multihost and (
                    (first and params.save_initial_examples)
                    or iteration % params.save_example_period < k_step):
                status(f"saving samples to {params.out_samples} (iteration {iteration})")
                if k_step > 1:   # stacked (k, B, ...) chunk: sample vs its last batch
                    batch = jax.tree_util.tree_map(lambda x: x[-1], batch)
                save_frames(np.asarray(batch["video"]),
                            f"{params.out_samples}/real_samples.png")
                cond = None
                if gan.cond_encoder is not None and "captions" in batch:
                    cond = _jitted_encode(gan)(state.txt_vars, batch["captions"],
                                               batch["lengths"])
                    if vocab is not None:
                        save_sentences(
                            batch["captions"],
                            f"{params.out_samples}/sentences_epoch{epoch:03d}_iter_{iteration:06d}.txt",
                            vocab)
                key, k = jax.random.split(key)
                nb = params.sample_batch_size or batch["video"].shape[0]
                if cond is not None:
                    cond = cond[:nb]
                for f in sample(gan, state, nb, k, cond=cond):
                    h, w = f.shape[-3], f.shape[-2]
                    save_frames(np.asarray(f),
                                f"{params.out_samples}/fake_samples_epoch_{epoch:03d}_iter_{iteration:06d}_{h}x{w}.png")
                if ema is not None:
                    from txt2vid_tpu.gan.ema import with_ema_params
                    for f in sample(gan, state, nb, k, cond=cond,
                                    g_vars=with_ema_params(state.g_vars, ema)):
                        h, w = f.shape[-3], f.shape[-2]
                        save_frames(np.asarray(f),
                                    f"{params.out_samples}/fake_ema_samples_epoch_{epoch:03d}_iter_{iteration:06d}_{h}x{w}.png")

            if on_iteration is not None:
                on_iteration(iteration, state)

            data_watch.start()
            # per-ITERATION time: one loop item is k_step train steps
            avg_iter.update(iter_watch.stop() / k_step)
            iter_watch.start()

    drain_pending()
    # final checkpoint: epoch-bounded (chunked) runs must resume from their LAST
    # iteration, not the last periodic boundary
    if params.save_model_period > 0 and iteration % params.save_model_period:
        name = checkpoint_name(iteration, gen_loss.get(), discrim_loss.get())
        save_checkpoint(state, f"{params.out}/{name}")
    checkpointer.wait()
    if ema_checkpointer is not None:
        ema_checkpointer.wait()
    if writer is not None:
        writer.close()
    return state
