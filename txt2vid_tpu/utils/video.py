"""Video-file export for generated samples.

The framework's training/eval surfaces dump PNG frame GRIDS (one row per
video, gan/trainer.py save_frames) — ideal for at-a-glance inspection, but a
text-to-video system's first-class artifact is a playable video file: the
reference's own data pipeline traffics in .avi clips (its synthetic generator
writes XVID .avi, reference data/synthetic/generate.py:193-217, and its
ingest decodes .avi/.mp4/.gif/.webm, create_cache.py:119-130). This module is
the write side of that story for GENERATED clips:

  * .gif  — PIL, always available, loops forever; the universal
            quick-share/preview format.
  * .avi / .mp4 / .webm — cv2 VideoWriter when OpenCV is present (it is in
            this image); XVID for .avi (the reference's own fourcc), mp4v for
            .mp4, VP80 for .webm.

Consumed by sample.py and serve.py via --format. Host-side only — nothing
here touches the compiled path.
"""

import os

import numpy as np

VIDEO_EXTS = (".gif", ".avi", ".mp4", ".webm")

_FOURCC = {".avi": "XVID", ".mp4": "mp4v", ".webm": "VP80"}


def to_uint8_frames(video: np.ndarray) -> np.ndarray:
    """(T, H, W, C) float [-1, 1] or uint8 -> (T, H, W, C) uint8."""
    v = np.asarray(video)
    if v.ndim == 3:                       # (T, H, W) grayscale
        v = v[..., None]
    assert v.ndim == 4, f"expected (T, H, W, C), got {v.shape}"
    if v.dtype != np.uint8:
        v = ((np.clip(v, -1.0, 1.0) + 1.0) * 127.5).astype(np.uint8)
    return v


def save_video(video: np.ndarray, path: str, fps: int = 8) -> str:
    """Write one clip — (T, H, W, C) in [-1,1] float or uint8 — to `path`.

    Container chosen by extension (VIDEO_EXTS). GIF needs only PIL; the cv2
    containers raise a clear ImportError when OpenCV is missing.
    """
    v = to_uint8_frames(video)
    ext = os.path.splitext(path)[1].lower()
    if ext == ".gif":
        from PIL import Image

        frames = [Image.fromarray(f[..., 0] if f.shape[-1] == 1 else f)
                  for f in v]
        frames[0].save(path, save_all=True, append_images=frames[1:],
                       duration=max(int(1000 / fps), 1), loop=0)
        return path
    if ext in _FOURCC:
        try:
            import cv2
        except ImportError as e:  # pragma: no cover - cv2 is in this image
            raise ImportError(
                f"writing {ext} requires OpenCV (cv2); use .gif instead") from e
        h, w = v.shape[1:3]
        writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*_FOURCC[ext]),
                                 fps, (w, h))
        if not writer.isOpened():  # pragma: no cover - codec-availability guard
            raise RuntimeError(f"cv2.VideoWriter could not open {path} "
                               f"({_FOURCC[ext]})")
        try:
            for f in v:
                if f.shape[-1] == 1:
                    f = np.repeat(f, 3, axis=-1)
                writer.write(f[..., ::-1])          # RGB -> BGR
        finally:
            writer.release()
        return path
    raise ValueError(f"unsupported video extension {ext!r} "
                     f"(one of {', '.join(VIDEO_EXTS)})")


def save_video_batch(videos: np.ndarray, path_fmt: str, fps: int = 8):
    """Write a batch — (B, T, H, W, C) — one file per clip; `path_fmt` is a
    format string with one `{i}` field. Returns the written paths."""
    return [save_video(v, path_fmt.format(i=i), fps=fps)
            for i, v in enumerate(np.asarray(videos))]
