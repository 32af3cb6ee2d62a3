"""Video-file export (utils/video.py) and its CLI wiring.

The reference framework's artifacts are playable clips (its synthetic
generator writes XVID .avi, reference data/synthetic/generate.py:193-217);
these tests pin the write side for generated samples: format conversion,
GIF/AVI/MP4 round-trips, and sample.py --format."""

import numpy as np
import pytest

from txt2vid_tpu.utils.video import (VIDEO_EXTS, save_video, save_video_batch,
                                     to_uint8_frames)

# fixture re-export: the tiny-checkpoint fixture (and its module-scoped cache)
# belongs to the CLI test module
from tests.test_clis import tiny_checkpoint  # noqa: F401


def _clip(t=6, h=16, w=16, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, (t, h, w, c)).astype(np.float32)


def test_to_uint8_frames_float_and_uint8():
    v = _clip()
    u = to_uint8_frames(v)
    assert u.dtype == np.uint8 and u.shape == v.shape
    # [-1, 1] endpoints map to 0 / 255
    ends = to_uint8_frames(np.array([[[[-1.0], [1.0]]]]))
    assert ends.min() == 0 and ends.max() == 255
    # uint8 passes through untouched; (T, H, W) grows a channel dim
    raw = (np.arange(2 * 4 * 4, dtype=np.uint8)).reshape(2, 4, 4)
    out = to_uint8_frames(raw)
    assert out.shape == (2, 4, 4, 1) and np.array_equal(out[..., 0], raw)


def test_gif_roundtrip(tmp_path):
    from PIL import Image

    v = _clip(t=5)
    path = save_video(v, str(tmp_path / "clip.gif"), fps=8)
    with Image.open(path) as im:
        assert im.n_frames == 5
        assert im.size == (16, 16)


def test_gif_grayscale(tmp_path):
    from PIL import Image

    v = _clip(t=3, c=1)
    path = save_video(v, str(tmp_path / "gray.gif"))
    with Image.open(path) as im:
        assert im.n_frames == 3


@pytest.mark.parametrize("ext", [".avi", ".mp4"])
def test_cv2_roundtrip(tmp_path, ext):
    cv2 = pytest.importorskip("cv2")

    v = _clip(t=4, h=32, w=24)        # non-square: catches (w, h) swaps
    path = save_video(v, str(tmp_path / f"clip{ext}"), fps=8)
    cap = cv2.VideoCapture(path)
    assert cap.isOpened()
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        assert frame.shape == (32, 24, 3)
        n += 1
    cap.release()
    assert n == 4


def test_cv2_content_fidelity(tmp_path):
    """Lossy codec, but a flat-color clip must come back approximately flat
    and approximately the right color (catches RGB/BGR swaps)."""
    cv2 = pytest.importorskip("cv2")

    v = np.zeros((4, 32, 32, 3), np.uint8)
    v[..., 0] = 200          # bright RED in RGB
    path = save_video(v, str(tmp_path / "red.avi"), fps=8)
    cap = cv2.VideoCapture(path)
    ok, frame = cap.read()   # cv2 reads BGR
    cap.release()
    assert ok
    b, g, r = frame.mean(axis=(0, 1))
    assert r > 150 and b < 60 and g < 60, (r, g, b)


def test_batch_and_bad_ext(tmp_path):
    v = np.stack([_clip(t=3, seed=i) for i in range(2)])
    paths = save_video_batch(v, str(tmp_path / "s_{i}.gif"))
    assert len(paths) == 2
    for p in paths:
        assert p.endswith(".gif")
    with pytest.raises(ValueError, match="unsupported video extension"):
        save_video(v[0], str(tmp_path / "clip.mkv"))
    assert ".mkv" not in VIDEO_EXTS


def test_sample_cli_gif(tiny_checkpoint, tmp_path):
    """sample.py --format gif writes one playable clip per sample."""
    import os
    import types

    from PIL import Image

    from txt2vid_tpu import sample as sample_cli
    from tests.test_clis import DIS_SPEC, GEN_SPEC, SENT_SPEC

    root, ckpt = tiny_checkpoint
    args = types.SimpleNamespace(
        weights=str(ckpt), G=GEN_SPEC, D=[DIS_SPEC], sent=SENT_SPEC,
        vocab=str(root / "vocab.pickle"), dont_use_sent=False,
        sentences=["digit 3 is left and right.", "digit 1 is up and down."],
        frame_sizes=[8, 16], num_frames=4, num_channels=1, num_samples=2,
        out_samples=str(tmp_path / "clips"), seed=0, format="gif", fps=4)
    sample_cli.main(args)
    files = sorted(os.listdir(tmp_path / "clips"))
    gifs = [f for f in files if f.endswith(".gif")]
    assert len(gifs) == 2, files          # eval mode: final scale only
    with Image.open(tmp_path / "clips" / gifs[0]) as im:
        assert im.n_frames == 4
