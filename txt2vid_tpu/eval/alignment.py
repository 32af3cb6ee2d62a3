"""Caption-video alignment metric for the synthetic moving-digit dataset.

The reference's headline capability is conditional generation whose samples MATCH
their captions (/root/reference/README.md:43-62 conditional moving-MNIST grids);
the reference only ever verified this visually (thesis.tex:559). The synthetic
grammar makes it machine-checkable: the four motion classes
("left and right" / "right and left" / "top and bottom" / "bottom and top",
data/synthetic.py caption grammar mirroring reference synthetic/generate.py:59-191)
are recoverable from the brightness-centroid track of a video — motion axis from
the track's dominant variance, direction from the initial displacement (clips
always start at the caption's first-named endpoint).

`alignment_report` generates videos from every motion class (k samples per class,
fresh z), classifies the generated motion, and reports accuracy against the
conditioning caption. Chance = 25% (4-way); axis-only chance = 50%.
"""

import argparse

import jax

# persistent compile cache (shared with the train CLI; first eval compile of a
# big sampler can take minutes through remote transports)
from txt2vid_tpu.utils.cache import setup_compile_cache

setup_compile_cache()  # backend-scoped persistent compile cache (utils/cache.py)

import numpy as np

MOTION_CLASSES = ("left and right", "right and left",
                  "top and bottom", "bottom and top")


def caption_motion_class(sentence: str):
    s = sentence.lower()
    for i, m in enumerate(MOTION_CLASSES):
        if m in s:
            return i
    return None


def centroid_track(video: np.ndarray) -> np.ndarray:
    """(T, H, W, C) video -> (T, 2) brightness-centroid track (x, y)."""
    v = np.asarray(video, np.float32)
    if v.max() > 2.0:          # uint8-ish
        bright = v[..., 0] / 255.0
    else:                      # [-1, 1]
        bright = (v[..., 0] + 1.0) / 2.0
    t, h, w = bright.shape
    # emphasize the digit over background noise in generated samples
    flat = bright.reshape(t, -1)
    thresh = np.maximum(0.25, flat.mean(1, keepdims=True)
                        + 0.5 * flat.std(1, keepdims=True))
    wgt = np.clip(flat - thresh, 0.0, None).reshape(t, h, w)
    wgt_sum = wgt.sum(axis=(1, 2)) + 1e-8
    xs = np.arange(w, dtype=np.float32)
    ys = np.arange(h, dtype=np.float32)
    cx = (wgt.sum(axis=1) * xs).sum(axis=1) / wgt_sum
    cy = (wgt.sum(axis=2) * ys).sum(axis=1) / wgt_sum
    return np.stack([cx, cy], axis=1)


def classify_motion(video: np.ndarray):
    """-> (class index into MOTION_CLASSES, axis_only index 0=horizontal 1=vertical)."""
    track = centroid_track(video)
    cx, cy = track[:, 0], track[:, 1]
    horizontal = cx.var() > cy.var()
    line = cx if horizontal else cy
    d = line - line[0]
    # initial direction: first displacement that clears noise (clips start at the
    # caption's first endpoint and move toward the second)
    sig = np.nonzero(np.abs(d) > max(1.0, 0.15 * (line.max() - line.min())))[0]
    sign = d[sig[0]] > 0 if len(sig) else (d[np.abs(d).argmax()] > 0)
    if horizontal:
        cls = 0 if sign else 1           # left->right vs right->left
    else:
        cls = 2 if sign else 3           # top->bottom vs bottom->top
    return cls, (0 if horizontal else 1)


def classify_batch(videos) -> np.ndarray:
    return np.asarray([classify_motion(np.asarray(v))[0] for v in videos])


def _digit_templates(size: int = 28, mnist_path=None):
    """Per-digit correlation templates, keyed off the RUN'S glyph source: pass the
    same --mnist path the data generator was given (data/synthetic.py:83-92) so a
    model trained on MNIST glyphs is scored against MNIST templates (per-class
    mean), and a PIL-font run against the PIL glyphs — not a mismatched set."""
    from txt2vid_tpu.data.synthetic import _glyph_digits, _mnist_digits
    glyphs = _mnist_digits(mnist_path, size) if mnist_path else None
    if glyphs is None:
        glyphs = _glyph_digits(size)
    t = np.stack([np.mean([g.astype(np.float32) / 255.0 for g in gs], axis=0)
                  for gs in glyphs.values()])
    t -= t.mean(axis=(1, 2), keepdims=True)
    return t / (np.linalg.norm(t.reshape(10, -1), axis=1)[:, None, None] + 1e-8)


def classify_digit(video: np.ndarray, templates=None) -> int:
    """Which digit is moving: crop a glyph-sized patch at the brightness centroid
    of each frame, correlate with the dataset's glyph templates, vote over frames."""
    if templates is None:
        templates = _digit_templates()
    v = np.asarray(video, np.float32)
    bright = (v[..., 0] + 1.0) / 2.0 if v.max() <= 2.0 else v[..., 0] / 255.0
    track = centroid_track(video)
    th, tw = templates.shape[1:]
    votes = np.zeros(10)
    t, h, w = bright.shape
    # small shift search: the brightness centroid is not the glyph's crop center
    for fi in range(t):
        cx, cy = track[fi]
        best = np.full(10, -np.inf)
        for dy in range(-3, 4):
            for dx in range(-3, 4):
                y0 = int(np.clip(round(cy - th / 2) + dy, 0, h - th))
                x0 = int(np.clip(round(cx - tw / 2) + dx, 0, w - tw))
                patch = bright[fi, y0:y0 + th, x0:x0 + tw]
                patch = patch - patch.mean()
                norm = np.linalg.norm(patch) + 1e-8
                corr = (templates * (patch / norm)).sum(axis=(1, 2))
                best = np.maximum(best, corr)
        votes += best
    return int(votes.argmax())


def alignment_report(gan, state, vocab, k_per_class: int = 32, digits=range(10),
                     seed: int = 0, batch_size: int = 40, mnist_path=None):
    """Generate k_per_class videos per motion class (digits cycled, fresh z each),
    classify, and report 4-way + axis-only accuracy with a confusion matrix."""
    import jax
    import jax.numpy as jnp

    from txt2vid_tpu.data import encode_caption
    from txt2vid_tpu.gan.trainer import sample

    digits = list(digits)
    caps, labels = [], []
    for ci, motion in enumerate(MOTION_CLASSES):
        for k in range(k_per_class):
            d = digits[k % len(digits)]
            caps.append(f"digit {d} is {motion}.")
            labels.append(ci)
    labels = np.asarray(labels)

    enc = [encode_caption(vocab, c) for c in caps]
    maxlen = max(len(c) for c in enc)
    toks = np.zeros((len(enc), maxlen), np.int32)
    lengths = np.asarray([len(c) for c in enc], np.int32)
    for i, c in enumerate(enc):
        toks[i, :len(c)] = c

    digit_labels = np.asarray([digits[k % len(digits)]
                               for _ in MOTION_CLASSES for k in range(k_per_class)])
    templates = _digit_templates(mnist_path=mnist_path)

    key = jax.random.key(seed)
    preds, digit_preds, conds = [], [], []
    for i in range(0, len(caps), batch_size):
        tb = jnp.asarray(toks[i:i + batch_size])
        lb = jnp.asarray(lengths[i:i + batch_size])
        cond = gan.encode(state.txt_vars, tb, lb)
        conds.append(np.asarray(cond))
        key, kz = jax.random.split(key)
        fakes = sample(gan, state, tb.shape[0], kz, cond=cond)
        vids = np.asarray(fakes[-1])
        preds.append(classify_batch(vids))
        digit_preds.append([classify_digit(v, templates) for v in vids])
    preds = np.concatenate(preds)
    digit_preds = np.concatenate(digit_preds)
    # encoder health: mean pairwise L2 distance between the caption encodings.
    # A collapsed encoder (the --end2end-in-G failure mode, see train_step.py's
    # end2end_txt_in_g) maps every caption to ~one point: spread ~1e-3 vs ~2.0
    # for a healthy pretrained encoder.
    cond_all = np.concatenate(conds)
    sub = cond_all[np.random.default_rng(0).permutation(len(cond_all))[:64]]
    cond_spread = float(np.mean(
        np.linalg.norm(sub[:, None, :] - sub[None, :, :], axis=-1)))

    conf = np.zeros((4, 4), np.int64)
    for l, p in zip(labels, preds):
        conf[l, p] += 1
    axis = lambda c: 0 if c < 2 else 1
    acc = float((preds == labels).mean())
    axis_acc = float(np.mean([axis(p) == axis(l) for p, l in zip(preds, labels)]))
    return {"accuracy_4way": acc, "accuracy_axis": axis_acc,
            "accuracy_digit": float((digit_preds == digit_labels).mean()),
            "chance_4way": 0.25, "chance_axis": 0.5, "chance_digit": 0.1,
            "cond_spread": cond_spread,
            "n": int(len(labels)), "confusion": conf.tolist()}


def real_data_ceiling(video_dir, sent_pickle, n: int = 200, num_frames: int = 16,
                      mnist_path=None):
    """Classifier sanity ceiling: accuracy of classify_motion on REAL clips vs
    their own captions (upper bound for the generated-sample metric)."""
    from txt2vid_tpu.data import load_video_frames
    from txt2vid_tpu.utils.misc import load_pickle
    from pathlib import Path

    sents = load_pickle(sent_pickle)
    templates = _digit_templates(mnist_path=mnist_path)
    ok = ok_digit = total = 0
    for vid, caps in list(sents.items())[:n]:
        cls = caption_motion_class(caps[0])
        if cls is None:
            continue
        v = load_video_frames(Path(video_dir) / str(vid), num_frames=num_frames,
                              num_channels=1)
        pred, _ = classify_motion(v)
        ok += int(pred == cls)
        digit = int(caps[0].split()[1])
        ok_digit += int(classify_digit(v, templates) == digit)
        total += 1
    return {"real_accuracy_4way": ok / max(total, 1),
            "real_accuracy_digit": ok_digit / max(total, 1), "n": total}


def main(args):
    import jax.numpy as jnp
    import jax
    import json
    import optax

    from txt2vid_tpu.config import create_object
    from txt2vid_tpu.gan.cond_gan import CondGan
    from txt2vid_tpu.gan.train_step import TrainConfig, init_state_abstract
    from txt2vid_tpu.utils import load_pickle, status
    from txt2vid_tpu.utils.checkpoint import restore_state

    vocab = load_pickle(args.vocab)
    txt_encoder = create_object(args.sent or "txt2vid_tpu.models.txt.Seq2Seq",
                                vocab_size=len(vocab))
    gen = create_object(args.G, cond_dim=txt_encoder.encoding_size)
    discrims = [create_object(d, cond_dim=txt_encoder.encoding_size)
                for d in args.D]
    mapping = create_object(args.M) if getattr(args, "M", None) else None
    gan = CondGan(gen=gen, discrims=discrims, cond_encoder=txt_encoder,
                  sample_mapping=mapping)

    config = TrainConfig(frame_sizes=tuple(args.frame_sizes),
                         latent_size=gan.gen.latent_size)
    batch = {"video": jnp.zeros((2, args.num_frames, args.frame_sizes[-1],
                                 args.frame_sizes[-1], args.num_channels),
                                jnp.float32),
             "captions": jnp.ones((2, 8), jnp.int32),
             "lengths": jnp.full((2,), 8, jnp.int32)}
    opt = optax.adam(1e-4)
    state = init_state_abstract(gan, jax.random.key(0), batch, opt, opt, config)
    status(f"Restoring {args.weights}")
    state = restore_state(state, args.weights)
    if getattr(args, "ema", False):
        from txt2vid_tpu.gan.ema import load_ema, with_ema_params
        ema_params = load_ema(args.weights, state.g_vars["params"])
        assert ema_params is not None, \
            f"--ema: no sibling {args.weights}.ema (run trained without --g_ema?)"
        status(f"Scoring EMA params from {args.weights}.ema")
        state = state.replace(g_vars=with_ema_params(state.g_vars, ema_params))

    report = alignment_report(gan, state, vocab, k_per_class=args.k_per_class,
                              seed=args.seed, batch_size=args.batch_size,
                              mnist_path=args.mnist)
    if args.real_videos:
        report.update(real_data_ceiling(args.real_videos, args.real_sents,
                                        mnist_path=args.mnist))
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--weights", required=True)
    p.add_argument("--G", required=True)
    p.add_argument("--D", nargs="+", required=True)
    p.add_argument("--sent", default=None)
    p.add_argument("--M", default=None,
                   help="sample-mapping spec (TCWYT FrameMap), as in train/gan.py")
    p.add_argument("--vocab", required=True)
    p.add_argument("--frame_sizes", type=int, nargs="+", default=[8, 16, 32, 64])
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--num_channels", type=int, default=1)
    p.add_argument("--k_per_class", type=int, default=32)
    p.add_argument("--batch_size", type=int, default=40)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--real_videos", default=None,
                   help="optional real video dir for the classifier ceiling")
    p.add_argument("--real_sents", default=None)
    p.add_argument("--mnist", default=None,
                   help="raw-MNIST dir IF the training data was generated with "
                        "--mnist (keys digit templates to the run's glyph source)")
    p.add_argument("--ema", action="store_true",
                   help="score the sibling <weights>.ema generator average "
                        "instead of the live params (gan/ema.py)")
    main(p.parse_args())
