"""Frame-cache preprocessors (reference data/create_cache.py & create_cache_2.py).

Decodes source videos (.avi/.mp4/.gif/.webm via cv2, gated import) or frame dirs,
picks `num_frames` evenly spaced frames, resizes square, and writes packed uint8
.npy caches (T, H, W, C) — the fast path the loader mmaps. A multiprocessing pool
parallelizes the decode as the reference does (create_cache.py:119-130)."""

import multiprocessing as mp
from pathlib import Path

import numpy as np

from txt2vid_tpu.data import pick_frames
from txt2vid_tpu.utils.misc import ensure_exists

VIDEO_SUFFIXES = (".avi", ".mp4", ".gif", ".webm", ".mkv")


def decode_video(path: str, size: int | None = None) -> np.ndarray | None:
    """cv2 decode to uint8 (T, H, W, 3) RGB; None if cv2 missing or decode fails."""
    try:
        import cv2
    except ImportError:
        return None
    cap = cv2.VideoCapture(str(path))
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        if size is not None:
            frame = cv2.resize(frame, (size, size))
        frames.append(frame)
    cap.release()
    if not frames:
        return None
    return np.stack(frames)


def cache_one(args):
    src, out_dir, size, num_frames = args
    src = Path(src)
    out = Path(out_dir) / (src.stem + ".npy")
    if out.exists():
        return src.stem, True
    frames = decode_video(src, size)
    if frames is None:
        return src.stem, False
    if num_frames is not None and len(frames) >= num_frames:
        frames = frames[pick_frames(len(frames), num_frames)]
    np.save(out, frames)
    return src.stem, True


def build_cache(video_dir, out_dir, size=64, num_frames=16, workers=8):
    """Cache every video under video_dir (reference create_cache_2.py semantics:
    pre-pick evenly spaced frames before writing)."""
    ensure_exists(out_dir)
    srcs = [p for p in Path(video_dir).iterdir() if p.suffix.lower() in VIDEO_SUFFIXES]
    jobs = [(str(p), str(out_dir), size, num_frames) for p in srcs]
    with mp.Pool(workers) as pool:
        results = pool.map(cache_one, jobs)
    ok = sum(1 for _, s in results if s)
    print(f"cached {ok}/{len(results)} videos -> {out_dir}")
    return results


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--videos", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--workers", type=int, default=8)
    a = p.parse_args()
    build_cache(a.videos, a.out, a.size, a.num_frames, a.workers)
