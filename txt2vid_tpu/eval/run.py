"""Sample-fidelity evaluation CLI: generate N videos from a checkpoint and score
them against real data (FID over random-conv features + pixel statistics) — the
quantitative evaluation the reference never implemented (thesis.tex:557).

    python -m txt2vid_tpu.eval.run --weights out/iter_... \\
        --G txt2vid_tpu.models.tganv2_cond.MultiScaleGen \\
        --D txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim \\
        --vocab vocab.pickle --data ./videos --anno sent.pickle --num 128
"""

import argparse
import json

import jax

# persistent compile cache (shared with the train CLI; first eval compile of a
# big sampler can take minutes through remote transports)
from txt2vid_tpu.utils.cache import setup_compile_cache

setup_compile_cache()  # backend-scoped persistent compile cache (utils/cache.py)
import numpy as np

from txt2vid_tpu.config import create_object
from txt2vid_tpu.data import VideoDataset
from txt2vid_tpu.eval.metrics import sample_fidelity_report
from txt2vid_tpu.gan.cond_gan import CondGan
from txt2vid_tpu.gan.train_step import TrainConfig, init_state_abstract
from txt2vid_tpu.gan.trainer import sample, _jitted_encode
from txt2vid_tpu.utils import status, load_pickle
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
    mapping = create_object(args.M) if getattr(args, "M", None) else None
    gan = CondGan(gen=gen, discrims=discrims, cond_encoder=txt_encoder,
                  sample_mapping=mapping)

    config = TrainConfig(frame_sizes=tuple(args.frame_sizes),
                         latent_size=gan.gen.latent_size)
    b = args.batch_size
    tmpl_batch = {"video": jnp.zeros(
        (b, args.num_frames, args.frame_sizes[-1], args.frame_sizes[-1],
         args.num_channels), jnp.float32)}
    if txt_encoder is not None:
        tmpl_batch["captions"] = jnp.ones((b, 8), jnp.int32)
        tmpl_batch["lengths"] = jnp.full((b,), 8, jnp.int32)
    opt = optax.adam(1e-4)
    state = init_state_abstract(gan, jax.random.key(0), tmpl_batch, opt, opt, config)
    status(f"Restoring {args.weights}")
    state = restore_state(state, args.weights)

    if args.data.lstrip().startswith("{") or args.data.endswith(".json"):
        # component spec (same surface as the train CLI's --data): any per-item
        # dataset, e.g. packed_dataset — PackedVideoDataset supports __getitem__
        dset = create_object(args.data, vocab=vocab, anno=args.anno,
                             num_frames=args.num_frames,
                             frame_size=args.frame_sizes[-1],
                             num_channels=args.num_channels)
    else:
        dset = VideoDataset(video_dir=args.data, vocab=vocab, captions=args.anno,
                            num_frames=args.num_frames,
                            frame_size=args.frame_sizes[-1],
                            num_channels=args.num_channels)

    reals, fakes = [], []
    key = jax.random.key(args.seed)
    rng = np.random.default_rng(args.seed)
    idxs = rng.permutation(len(dset))[:args.num]
    for start in range(0, len(idxs), b):
        chunk = idxs[start:start + b]
        if len(chunk) < b:
            break
        items = [dset[int(i)] for i in chunk]
        reals.append(np.stack([v for v, _ in items]))
        cond = None
        if txt_encoder is not None:
            caps = np.zeros((b, 16), np.int32)
            lengths = np.zeros((b,), np.int32)
            for i, (_, c) in enumerate(items):
                c = c[:16]
                caps[i, :len(c)] = c
                lengths[i] = len(c)
            cond = _jitted_encode(gan)(state.txt_vars, jnp.asarray(caps),
                                       jnp.asarray(lengths))
        key, k = jax.random.split(key)
        fakes.append(np.asarray(sample(gan, state, b, k, cond=cond)[-1]))

    real = np.concatenate(reals)
    fake = np.concatenate(fakes)
    status(f"evaluating {len(real)} real vs {len(fake)} generated videos")
    feature_fn = None
    if not getattr(args, "no_discrim_fid", False):
        from txt2vid_tpu.eval.metrics import discrim_features
        feature_fn = lambda v: discrim_features(gan, state, v,
                                                batch_size=args.batch_size)
    report = sample_fidelity_report(real, fake, feature_fn=feature_fn)
    # headline fidelity metric: FID in the FROZEN classifier feature space
    # (eval/classifier.py) — comparable across runs and configs, unlike the
    # run-relative discriminator FID or the noise-floor random-conv proxy
    from txt2vid_tpu.eval.classifier import classifier_fid, load_frozen
    if load_frozen() is not None:
        report["fid_cls"] = classifier_fid(real, fake,
                                           batch_size=args.batch_size)
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--weights", required=True)
    p.add_argument("--G", required=True)
    p.add_argument("--D", nargs="+", required=True)
    p.add_argument("--sent", default=None)
    p.add_argument("--M", default=None,
                   help="sample-mapping spec (TCWYT FrameMap), as in train/gan.py")
    p.add_argument("--vocab", default=None)
    p.add_argument("--dont_use_sent", action="store_true")
    p.add_argument("--data", required=True)
    p.add_argument("--anno", default=None)
    p.add_argument("--frame_sizes", type=int, nargs="+", default=[8, 16, 32, 64])
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--num_channels", type=int, default=3)
    p.add_argument("--num", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no_discrim_fid", action="store_true",
                   help="skip the trained-discriminator-feature FID")
    main(p.parse_args())
