"""Synthetic moving-digit video generator (reference txt2vid/data/synthetic/generate.py).

Behavior parity: digits animated linearly between two random points (horizontal or
vertical motion, bounce-repeat, random animation length in [0.1*T, T]), captions of the
form "digit 9 is left and right." / "... top and bottom." / reversed variants, emitted
as a {example_idx: [sentence]} pickle (generate.py:59-191).

Re-design for the TPU pipeline: frames are written as packed uint8 .npy caches (no
cv2/XVID dependency) and the digit glyphs come from MNIST if a local copy exists, else
from PIL's bundled bitmap font (the environment has no network egress; glyph source
does not change the task semantics — motion/caption structure is the dataset)."""

import pickle
import random
from pathlib import Path

import numpy as np

from txt2vid_tpu.utils.misc import ensure_exists


def _glyph_digits(size: int = 28):
    """Render digit glyphs 0-9 with PIL's built-in font, scaled to `size`. Drawn at
    offset taps for a bold stroke — MNIST-like pixel density (thin glyphs make the
    data mode ~99% background, which invites early GAN mode collapse)."""
    from PIL import Image, ImageDraw, ImageFont
    font = ImageFont.load_default()
    glyphs = {}
    for d in range(10):
        img = Image.new("L", (16, 16), 0)
        draw = ImageDraw.Draw(img)
        for dx in (0, 1):
            for dy in (0, 1):
                draw.text((4 + dx, 2 + dy), str(d), fill=255, font=font)
        glyphs[d] = [np.asarray(img.resize((size, size), Image.NEAREST))]
    return glyphs


def _mnist_digits(mnist_path: str, size: int = 28, per_class: int = 50):
    """Load digits from a local raw-MNIST images/labels pair if available."""
    import gzip
    p = Path(mnist_path)
    imgs_f = p / "train-images-idx3-ubyte.gz"
    labels_f = p / "train-labels-idx1-ubyte.gz"
    if not imgs_f.exists():
        return None
    with gzip.open(imgs_f) as f:
        data = np.frombuffer(f.read(), np.uint8, offset=16).reshape(-1, 28, 28)
    with gzip.open(labels_f) as f:
        labels = np.frombuffer(f.read(), np.uint8, offset=8)
    glyphs = {d: [] for d in range(10)}
    for img, lab in zip(data, labels):
        if len(glyphs[int(lab)]) < per_class:
            glyphs[int(lab)].append(img)
    return glyphs


def render_video(glyph: np.ndarray, frame_size, num_frames, animation_len,
                 from_pt, to_pt, repeat=True, num_channels=1):
    """Linear interpolation of the glyph position from from_pt to to_pt over
    animation_len frames, bouncing back and repeating (generate.py generate_frames)."""
    w, h = frame_size
    gh, gw = glyph.shape[:2]
    frames = np.zeros((num_frames, h, w, num_channels), dtype=np.uint8)
    a, b = np.asarray(from_pt, float), np.asarray(to_pt, float)
    pos, tgt = a.copy(), b.copy()
    steps = max(animation_len, 1)
    vel = (tgt - pos) / steps
    for t in range(num_frames):
        x = int(np.clip(round(pos[0]), 0, w - gw))
        y = int(np.clip(round(pos[1]), 0, h - gh))
        patch = glyph[..., None] if glyph.ndim == 2 else glyph
        frames[t, y:y + gh, x:x + gw] = np.broadcast_to(patch, (gh, gw, num_channels))
        pos = pos + vel
        if repeat and (np.linalg.norm(pos - tgt) < np.linalg.norm(vel) + 1e-6
                       or not (0 <= pos[0] <= w and 0 <= pos[1] <= h)):
            tgt = a.copy() if np.allclose(tgt, b) else b.copy()
            vel = (tgt - pos) / steps
    return frames


def generate_examples(video_dir, sentence_out, num_examples=100, frame_size=(64, 64),
                      num_frames=64, seed=300, mnist_path=None, num_channels=1):
    """Generate the dataset: .npy frame caches + {idx: [sentence]} caption pickle."""
    ensure_exists(video_dir)
    rng_py = random.Random(seed)
    rng = np.random.default_rng(seed)
    w, h = frame_size

    glyphs = _mnist_digits(mnist_path) if mnist_path else None
    if glyphs is None:
        glyphs = _glyph_digits()

    sent_map = {}
    for i in range(num_examples):
        digit = int(rng.integers(0, 10))
        glyph = glyphs[digit][int(rng.integers(0, len(glyphs[digit])))]
        gh, gw = glyph.shape[:2]

        animation_length = rng_py.randint(int(0.1 * num_frames), num_frames)
        horizontal = rng_py.randint(0, 1)
        l2r_u2d = rng_py.randint(0, 1)

        sentence = f"digit {digit} is "
        if horizontal:
            y = int(rng.integers(0, h))
            x1 = int(rng.integers(0, max(int(0.1 * w), 1)))
            x2 = int(rng.integers(int(0.9 * w), w))
            a, b = np.array([x1, y]), np.array([x2, y])
            sentence += "left and right" if l2r_u2d else "right and left"
        else:
            x = int(rng.integers(0, w))
            y1 = int(rng.integers(0, max(int(0.1 * h), 1)))
            y2 = int(rng.integers(int(0.9 * h), h))
            a, b = np.array([x, y1]), np.array([x, y2])
            sentence += "top and bottom" if l2r_u2d else "bottom and top"
        if not l2r_u2d:
            a, b = b, a
        sentence += "."

        a[0] = np.clip(a[0], 0, w - gw); a[1] = np.clip(a[1], 0, h - gh)
        b[0] = np.clip(b[0], 0, w - gw); b[1] = np.clip(b[1], 0, h - gh)

        frames = render_video(glyph, frame_size, num_frames, animation_length,
                              a, b, repeat=True, num_channels=num_channels)
        np.save(Path(video_dir) / f"{i}.npy", frames)
        sent_map[i] = [sentence]

    with open(sentence_out, "wb") as f:
        pickle.dump(sent_map, f)
    return sent_map


if __name__ == "__main__":
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, required=True, help="output root dir")
    parser.add_argument("--num_train", type=int, default=40000)
    parser.add_argument("--num_test", type=int, default=10000)
    parser.add_argument("--num_frames", type=int, default=64)
    parser.add_argument("--frame_size", type=int, default=64)
    parser.add_argument("--mnist", type=str, default=None,
                        help="optional local raw-MNIST dir")
    args = parser.parse_args()
    for split, n, seed in (("train", args.num_train, 300), ("test", args.num_test, 301)):
        root = Path(args.out) / split
        ensure_exists(root)
        generate_examples(root / "videos", root / "sent.pickle", num_examples=n,
                          frame_size=(args.frame_size, args.frame_size),
                          num_frames=args.num_frames, seed=seed,
                          mnist_path=args.mnist)
        print(f"{split}: {n} examples -> {root}")
