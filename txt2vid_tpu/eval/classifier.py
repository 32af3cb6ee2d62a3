"""Frozen video classifier: a run-comparable fidelity metric for the synthetic
moving-digit data.

Why: the reference never implemented quantitative evaluation (thesis.tex:557 — FID
"was going to be utilised, but unfortunately was not incorporated"); our
RandomConvFeatures FID proxy (eval/metrics.py) has no discriminative power at the
checkpoints that matter (r3 trajectory: 0.00107 @ iter 14k vs 0.00106 @ 32k), and
the trained-discriminator FID is run-relative. The synthetic grammar gives labels
for free (caption "digit D is M." -> digit class D, motion class M), so a small
3D-conv classifier trained ONCE on those labels and FROZEN in-repo provides
  * `classifier_features` — a fixed feature space (like the Inception role in
    standard FID) in which any two runs/checkpoints are comparable, and
  * label heads whose accuracy on generated samples is a second capability signal
    (complementing the handcrafted centroid classifier in eval/alignment.py).

The classifier canonicalizes any input video to (16, 32, 32, 1) with
jax.image.resize inside apply, so 64px/16f and 128px/32f runs score in the SAME
feature space — cross-run and cross-config comparable, unlike crop-based loaders.

Train once (TPU, ~2 min):
    python -m txt2vid_tpu.eval.classifier --data synthetic_big/train/videos.t2vc \
        --anno synthetic_big/train/sent.pickle \
        --val_videos synthetic_big/test/videos --val_anno synthetic_big/test/sent.pickle \
        --out txt2vid_tpu/eval/weights/video_cls.msgpack

Frozen weights ship in-repo (float16 msgpack, ~0.6 MB); `load_frozen()` finds them.
"""

import argparse
import json
import re
from pathlib import Path

import numpy as np

CANON_FRAMES = 16
CANON_SIZE = 32
FROZEN_PATH = Path(__file__).parent / "weights" / "video_cls.msgpack"

MOTION_CLASSES = ("left and right", "right and left",
                  "top and bottom", "bottom and top")

_CAP_RE = re.compile(r"digit\s+(\d)\s+is\s+(.+?)\.?\s*$")


def caption_labels(caption: str):
    """caption 'digit D is M.' -> (digit 0-9, motion 0-3) or None if unparseable
    (grammar: data/synthetic.py, mirroring reference synthetic/generate.py:59-191)."""
    m = _CAP_RE.match(caption.strip().lower())
    if not m:
        return None
    digit = int(m.group(1))
    motion = m.group(2).strip()
    if motion not in MOTION_CLASSES:
        return None
    return digit, MOTION_CLASSES.index(motion)


def _build_model():
    import flax.linen as nn
    import jax.numpy as jnp
    import jax

    class VideoClassifier(nn.Module):
        """(B, T, H, W, C) in [-1,1] -> (features (B,128), digit logits (B,10),
        motion logits (B,4)). Input is resized to the canonical
        (CANON_FRAMES, CANON_SIZE, CANON_SIZE, 1) inside apply — resolution- and
        frame-count-agnostic by construction. GroupNorm (not BN): no batch
        statistics, so features are deterministic and batch-size independent."""

        @nn.compact
        def __call__(self, x):
            b = x.shape[0]
            if x.shape[-1] != 1:            # luma for RGB inputs
                x = jnp.mean(x, axis=-1, keepdims=True)
            if x.shape[1:4] != (CANON_FRAMES, CANON_SIZE, CANON_SIZE):
                x = jax.image.resize(
                    x, (b, CANON_FRAMES, CANON_SIZE, CANON_SIZE, 1), "linear")
            for ch, st in ((16, (1, 2, 2)), (32, (2, 2, 2)),
                           (64, (2, 2, 2)), (128, (2, 2, 2))):
                x = nn.Conv(ch, (3, 3, 3), strides=st, use_bias=False)(x)
                x = nn.GroupNorm(num_groups=8)(x)
                x = nn.relu(x)
            feats = jnp.mean(x, axis=(1, 2, 3))             # (B, 128)
            digit = nn.Dense(10)(feats)
            motion = nn.Dense(4)(feats)
            return feats, digit, motion

    return VideoClassifier()


_frozen_cache = None


def load_frozen(path=None):
    """Load the frozen classifier params (float16 on disk -> float32), cached."""
    global _frozen_cache
    if path is None and _frozen_cache is not None:
        return _frozen_cache
    import flax.serialization
    import jax

    p = Path(path) if path is not None else FROZEN_PATH
    if not p.exists():
        return None
    model = _build_model()
    tmpl = jax.eval_shape(
        lambda k: model.init(k, np.zeros((1, CANON_FRAMES, CANON_SIZE,
                                          CANON_SIZE, 1), np.float32)),
        jax.random.key(0))
    tmpl = jax.tree_util.tree_map(lambda s: np.zeros(s.shape, np.float16), tmpl)
    with open(p, "rb") as f:
        params = flax.serialization.from_bytes(tmpl, f.read())
    params = jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float32), params)
    if path is None:
        _frozen_cache = params
    return params


def classifier_features(videos, params=None, batch_size: int = 32):
    """(N, T, H, W, C) videos in [-1,1] -> (N, 128) frozen-classifier features."""
    import jax
    import jax.numpy as jnp

    params = params if params is not None else load_frozen()
    assert params is not None, \
        f"no frozen classifier weights at {FROZEN_PATH}; train with " \
        "python -m txt2vid_tpu.eval.classifier"
    model = _build_model()
    apply = jax.jit(lambda v: model.apply(params, v)[0])
    feats = []
    for i in range(0, len(videos), batch_size):
        feats.append(np.asarray(apply(jnp.asarray(videos[i:i + batch_size],
                                                  jnp.float32))))
    return np.concatenate(feats)


def classifier_fid(real_videos, fake_videos, params=None, batch_size: int = 32):
    """FID in the frozen-classifier feature space (run- and config-comparable)."""
    from txt2vid_tpu.eval.metrics import fid_from_features
    params = params if params is not None else load_frozen()
    return fid_from_features(
        classifier_features(real_videos, params, batch_size),
        classifier_features(fake_videos, params, batch_size))


def classify_videos(videos, params=None, batch_size: int = 32):
    """-> (digit_pred (N,), motion_pred (N,)) from the frozen heads."""
    import jax
    import jax.numpy as jnp

    params = params if params is not None else load_frozen()
    model = _build_model()
    apply = jax.jit(lambda v: model.apply(params, v)[1:])
    dp, mp = [], []
    for i in range(0, len(videos), batch_size):
        d, m = apply(jnp.asarray(videos[i:i + batch_size], jnp.float32))
        dp.append(np.asarray(d).argmax(-1))
        mp.append(np.asarray(m).argmax(-1))
    return np.concatenate(dp), np.concatenate(mp)


# ---------------------------------------------------------------- training CLI


def _load_labelled(packed_path, anno):
    """Packed cache + caption pickle -> (dataset, labels (N,2)). Items whose
    caption doesn't parse are dropped."""
    from txt2vid_tpu.data.packed import PackedVideoDataset

    ds = PackedVideoDataset(packed_path, vocab=None, captions=anno,
                            num_frames=CANON_FRAMES, frame_size=None,
                            num_channels=1, random_frames=1)
    keep, labels = [], []
    for i, cap in enumerate(ds.captions):
        lab = caption_labels(cap)
        if lab is not None:
            keep.append(i)
            labels.append(lab)
    return ds, np.asarray(keep), np.asarray(labels, np.int32)


def _load_val(video_dir, anno, n=500):
    from txt2vid_tpu.data import load_video_frames
    from txt2vid_tpu.utils.misc import load_pickle

    sents = load_pickle(anno)
    vids, labels = [], []
    for vid, caps in list(sents.items())[:n]:
        lab = caption_labels(caps[0])
        if lab is None:
            continue
        vids.append(load_video_frames(Path(video_dir) / str(vid),
                                      num_frames=CANON_FRAMES, num_channels=1))
        labels.append(lab)
    return np.stack(vids), np.asarray(labels, np.int32)


def main(args):
    import jax
    import jax.numpy as jnp
    import optax
    import flax.serialization

    from txt2vid_tpu.utils import status

    model = _build_model()
    ds, keep, labels = _load_labelled(args.data, args.anno)
    status(f"{len(keep)} labelled clips "
           f"({len(ds.captions) - len(keep)} unparseable dropped)")

    params = model.init(jax.random.key(args.seed),
                        np.zeros((1, CANON_FRAMES, CANON_SIZE, CANON_SIZE, 1),
                                 np.float32))
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, video, digit, motion):
        def loss_fn(p):
            _, dl, ml = model.apply(p, video)
            loss = (optax.softmax_cross_entropy_with_integer_labels(dl, digit).mean()
                    + optax.softmax_cross_entropy_with_integer_labels(ml, motion).mean())
            acc_d = (dl.argmax(-1) == digit).mean()
            acc_m = (ml.argmax(-1) == motion).mean()
            return loss, (acc_d, acc_m)

        (loss, (acc_d, acc_m)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, acc_d, acc_m

    rng = np.random.default_rng(args.seed)
    for step in range(args.steps):
        idx = rng.choice(len(keep), args.batch_size, replace=False)
        batch = ds.get_batch(keep[idx])
        lab = labels[idx]
        params, opt_state, loss, acc_d, acc_m = train_step(
            params, opt_state, jnp.asarray(batch["video"]),
            jnp.asarray(lab[:, 0]), jnp.asarray(lab[:, 1]))
        if step % 100 == 0 or step == args.steps - 1:
            status(f"step {step}: loss {float(loss):.4f} "
                   f"digit {float(acc_d):.3f} motion {float(acc_m):.3f}")

    report = {"steps": args.steps}
    if args.val_videos:
        vv, vl = _load_val(args.val_videos, args.val_anno, n=args.val_n)
        dp, mp = classify_videos(vv, params)
        report["val_digit_acc"] = float((dp == vl[:, 0]).mean())
        report["val_motion_acc"] = float((mp == vl[:, 1]).mean())
        status(f"val: digit {report['val_digit_acc']:.4f} "
               f"motion {report['val_motion_acc']:.4f} (n={len(vl)})")

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    params16 = jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float16), params)
    with open(out, "wb") as f:
        f.write(flax.serialization.to_bytes(params16))
    status(f"wrote {out} ({out.stat().st_size / 1e6:.2f} MB)")
    print(json.dumps(report))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True, help="packed .t2vc cache")
    p.add_argument("--anno", required=True, help="caption pickle")
    p.add_argument("--val_videos", default=None)
    p.add_argument("--val_anno", default=None)
    p.add_argument("--val_n", type=int, default=500)
    p.add_argument("--out", default=str(FROZEN_PATH))
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args())
