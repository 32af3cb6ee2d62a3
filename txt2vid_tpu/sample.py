"""Standalone sample-from-checkpoint CLI.

The reference's txt2vid/test.py is dead code (broken imports, test.py:17-23); this is
its working equivalent: load a GAN checkpoint, optionally encode captions from a
sentence file, and dump sample grids.

    python -m txt2vid_tpu.sample --weights out/iter_... \\
        --G txt2vid_tpu.models.tganv2_cond.MultiScaleGen \\
        --D txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim \\
        --vocab vocab.pickle --sentences "digit 3 is left and right." \\
        --out_samples samples/
"""

import argparse

import jax

# persistent compile cache (shared with the train CLI; first eval compile of a
# big sampler can take minutes through remote transports)
from txt2vid_tpu.utils.cache import setup_compile_cache

setup_compile_cache()  # backend-scoped persistent compile cache (utils/cache.py)
import numpy as np

from txt2vid_tpu.config import create_object
from txt2vid_tpu.data import encode_caption
from txt2vid_tpu.gan.cond_gan import CondGan
from txt2vid_tpu.gan.train_step import TrainConfig, init_state_abstract
from txt2vid_tpu.gan.trainer import sample, save_frames
from txt2vid_tpu.utils import status, load_pickle, ensure_exists
from txt2vid_tpu.utils.checkpoint import restore_state


def main(args):
    import jax.numpy as jnp
    import optax

    vocab = load_pickle(args.vocab) if args.vocab else None
    txt_encoder = None
    cond_dim = 0
    if vocab is not None and not args.dont_use_sent:
        txt_encoder = create_object(args.sent or "txt2vid_tpu.models.txt.Seq2Seq",
                                    vocab_size=len(vocab))
        cond_dim = txt_encoder.encoding_size

    gen = create_object(args.G, cond_dim=cond_dim)
    discrims = [create_object(d, cond_dim=cond_dim) for d in args.D]
    # --M must mirror the training run: the checkpoint's m_vars only restores
    # into a state template that also carries the sample mapping
    sample_mapping = create_object(args.M) if getattr(args, "M", None) else None
    gan = CondGan(gen=gen, discrims=discrims, cond_encoder=txt_encoder,
                  sample_mapping=sample_mapping)

    # rebuild the state template so the checkpoint can be restored into it
    config = TrainConfig(frame_sizes=tuple(args.frame_sizes),
                         latent_size=gan.gen.latent_size)
    batch = {"video": jnp.zeros(
        (args.num_samples, args.num_frames, args.frame_sizes[-1],
         args.frame_sizes[-1], args.num_channels), jnp.float32)}
    if txt_encoder is not None:
        batch["captions"] = jnp.ones((args.num_samples, 8), jnp.int32)
        batch["lengths"] = jnp.full((args.num_samples,), 8, jnp.int32)
    opt = optax.adam(1e-4)
    state = init_state_abstract(gan, jax.random.key(0), batch, opt, opt, config)
    status(f"Restoring {args.weights}")
    state = restore_state(state, args.weights)
    if getattr(args, "ema", False):
        from txt2vid_tpu.gan.ema import load_ema, with_ema_params
        ema_params = load_ema(args.weights, state.g_vars["params"])
        assert ema_params is not None, \
            f"--ema: no sibling {args.weights}.ema (run trained without --g_ema?)"
        status(f"Sampling with EMA params from {args.weights}.ema")
        state = state.replace(g_vars=with_ema_params(state.g_vars, ema_params))

    cond = None
    if txt_encoder is not None and args.sentences:
        caps = [encode_caption(vocab, s) for s in args.sentences]
        maxlen = max(len(c) for c in caps)
        toks = np.zeros((len(caps), maxlen), np.int32)
        lengths = np.asarray([len(c) for c in caps], np.int32)
        for i, c in enumerate(caps):
            toks[i, :len(c)] = c
        cond = gan.encode(state.txt_vars, jnp.asarray(toks), jnp.asarray(lengths))
        n = len(caps)
    else:
        n = args.num_samples

    ensure_exists(args.out_samples)
    fakes = sample(gan, state, n, jax.random.key(args.seed), cond=cond)
    fmt = getattr(args, "format", "png")
    for f in fakes:
        h, w = f.shape[-3], f.shape[-2]
        if fmt == "png":
            path = f"{args.out_samples}/sample_{h}x{w}.png"
            save_frames(np.asarray(f), path)
            status(f"wrote {path}")
        else:
            # one playable clip per sample (utils/video.py)
            from txt2vid_tpu.utils.video import save_video_batch
            for path in save_video_batch(
                    np.asarray(f),
                    f"{args.out_samples}/sample_{h}x{w}_{{i}}.{fmt}",
                    fps=args.fps):
                status(f"wrote {path}")


def cli(argv=None):
    """Console-script entry point (pyproject `txt2vid-sample`)."""
    p = argparse.ArgumentParser()
    p.add_argument("--weights", required=True)
    p.add_argument("--G", required=True)
    p.add_argument("--D", nargs="+", required=True)
    p.add_argument("--M", default=None,
                   help="sample-mapping spec when the checkpoint was trained "
                        "with --M (e.g. TCWYT FrameMap)")
    p.add_argument("--sent", default=None)
    p.add_argument("--vocab", default=None)
    p.add_argument("--dont_use_sent", action="store_true")
    p.add_argument("--sentences", nargs="+", default=None)
    p.add_argument("--frame_sizes", type=int, nargs="+", default=[8, 16, 32, 64])
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--num_channels", type=int, default=3)
    p.add_argument("--num_samples", type=int, default=8)
    p.add_argument("--out_samples", default="out_samples")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ema", action="store_true",
                   help="sample with the sibling <weights>.ema generator "
                        "average instead of the live params (gan/ema.py)")
    p.add_argument("--format", default="png",
                   choices=["png", "gif", "avi", "mp4", "webm"],
                   help="png = one grid image per scale (reference-style); "
                        "video formats = one playable clip per sample "
                        "(utils/video.py)")
    p.add_argument("--fps", type=int, default=8,
                   help="frame rate for video-format export")
    main(p.parse_args(argv))


if __name__ == "__main__":
    cli()
