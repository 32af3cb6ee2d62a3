"""Packed frame-cache: single-file mmap'd video store with a native (C++) batch
reader and a pure-numpy fallback.

This is the high-throughput input path: `write_packed_cache` converts any directory
of per-video caches (the reference's JPEG-dir layout or our .npy files) into one
"T2VC1" file; `PackedVideoDataset` + `PackedLoader` then assemble whole batches with
the C++ thread pool (txt2vid_tpu/native/framecache.cpp) — no per-item Python, no GIL
during the gather."""

import ctypes
import pickle
import struct
import subprocess
import threading
from pathlib import Path

import numpy as np

from txt2vid_tpu.data import pick_frames, encode_caption, transform_frames
from txt2vid_tpu.utils import status, warn

MAGIC = 0x0000314356325400  # "\0T2VC1\0\0" little-endian

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB = None
_LIB_TRIED = False


def _load_native():
    """dlopen the C++ reader, building it with make on first use."""
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so = _NATIVE_DIR / "libframecache.so"
    if not so.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True)
        except Exception as e:
            warn(f"native framecache build failed, using numpy fallback: {e}")
            return None
    try:
        lib = ctypes.CDLL(str(so))
        lib.fc_open.restype = ctypes.c_void_p
        lib.fc_open.argtypes = [ctypes.c_char_p]
        lib.fc_close.argtypes = [ctypes.c_void_p]
        lib.fc_num_videos.restype = ctypes.c_int64
        lib.fc_num_videos.argtypes = [ctypes.c_void_p]
        lib.fc_video_shape.restype = ctypes.c_int
        lib.fc_video_shape.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                       ctypes.POINTER(ctypes.c_int64)]
        lib.fc_read_batch.restype = ctypes.c_int
        lib.fc_read_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        _LIB = lib
    except OSError as e:
        warn(f"native framecache load failed, using numpy fallback: {e}")
    return _LIB


def write_packed_cache(videos, out_path, ids_out_path=None):
    """videos: iterable of (video_id, uint8 array (T, H, W, C)). Writes the packed
    file and a sidecar pickle mapping video_id -> index."""
    metas = []
    id_map = {}
    with open(out_path, "wb") as f:
        f.write(b"\0" * 16)  # placeholder header
        header_size = None
        entries = []
        data = []
        offset = 0
        for i, (vid, arr) in enumerate(videos):
            arr = np.ascontiguousarray(arr, dtype=np.uint8)
            if arr.ndim == 3:
                arr = arr[..., None]
            t, h, w, c = arr.shape
            entries.append((offset, t, h, w, c))
            id_map[str(vid)] = i
            data.append(arr)
            offset += arr.nbytes
        n = len(entries)
        header_size = 16 + n * (8 + 16)
        f.seek(0)
        f.write(struct.pack("<QQ", MAGIC, n))
        for (off, t, h, w, c) in entries:
            f.write(struct.pack("<QIIII", header_size + off, t, h, w, c))
        for arr in data:
            f.write(arr.tobytes())
    if ids_out_path is not None:
        with open(ids_out_path, "wb") as f:
            pickle.dump(id_map, f)
    return id_map


def pack_directory(video_dir, out_path):
    """Pack a directory of .npy per-video caches into one T2VC file."""
    video_dir = Path(video_dir)
    files = sorted(video_dir.glob("*.npy"), key=lambda p: p.stem)

    def gen():
        for p in files:
            yield p.stem, np.load(p)

    return write_packed_cache(gen(), out_path,
                              str(Path(out_path).with_suffix(".ids.pickle")))


class PackedReader:
    """mmap'd reader over a T2VC file; native batch gather when available."""

    def __init__(self, path, num_threads: int = 8):
        self.path = str(path)
        self.num_threads = num_threads
        self._lib = _load_native()
        self._handle = None
        if self._lib is not None:
            self._handle = self._lib.fc_open(self.path.encode())
            if not self._handle:
                warn(f"fc_open failed for {path}; numpy fallback")
                self._lib = None
        if self._lib is None:
            self._np_open()
        else:
            shape = (ctypes.c_int64 * 4)()
            self._lib.fc_video_shape(self._handle, 0, shape)
            self.frame_shape = tuple(int(x) for x in shape[1:])
            self.num_videos = int(self._lib.fc_num_videos(self._handle))
            self._video_t = None

    def _np_open(self):
        with open(self.path, "rb") as f:
            magic, n = struct.unpack("<QQ", f.read(16))
            assert magic == MAGIC, f"bad magic in {self.path}"
            metas = [struct.unpack("<QIIII", f.read(24)) for _ in range(n)]
        self._metas = metas
        self._mmap = np.memmap(self.path, dtype=np.uint8, mode="r")
        self.num_videos = n
        self.frame_shape = tuple(metas[0][2:5])
        self._video_t = [m[1] for m in metas]

    def video_num_frames(self, idx: int) -> int:
        if self._lib is not None:
            shape = (ctypes.c_int64 * 4)()
            self._lib.fc_video_shape(self._handle, idx, shape)
            return int(shape[0])
        return self._metas[idx][1]

    def read_batch(self, video_ids: np.ndarray, frame_idx: np.ndarray) -> np.ndarray:
        """(B,), (B, F) -> uint8 (B, F, H, W, C)."""
        b, fcount = frame_idx.shape
        h, w, c = self.frame_shape
        out = np.empty((b, fcount, h, w, c), dtype=np.uint8)
        if self._lib is not None:
            vids = np.ascontiguousarray(video_ids, dtype=np.int64)
            fidx = np.ascontiguousarray(frame_idx, dtype=np.int64)
            rc = self._lib.fc_read_batch(
                self._handle,
                vids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                fidx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                b, fcount,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                self.num_threads)
            if rc != 0:
                raise RuntimeError(f"fc_read_batch failed rc={rc}")
            return out
        for i, vid in enumerate(video_ids):
            off, t, hh, ww, cc = self._metas[int(vid)]
            video = self._mmap[off:off + t * hh * ww * cc].reshape(t, hh, ww, cc)
            out[i] = video[frame_idx[i]]
        return out

    def close(self):
        if self._lib is not None and self._handle:
            self._lib.fc_close(self._handle)
            self._handle = None


class PackedVideoDataset:
    """Batch-level dataset over a packed cache + captions: the whole (video, caption)
    batch assembly is one native call + one vectorized numpy transform."""

    def __init__(self, packed_path, vocab=None, captions=None, num_frames=16,
                 frame_size=None, num_channels=3, num_threads=8, normalize=True,
                 random_frames=0, seed=0):
        self.reader = PackedReader(packed_path, num_threads=num_threads)
        self.vocab = vocab
        self.num_frames = num_frames
        self.frame_size = frame_size
        self.num_channels = num_channels
        self.normalize = normalize           # False -> keep uint8 for host->device
        self.random_frames = bool(random_frames)
        self.rng = np.random.default_rng(seed)
        # BatchLoader calls get_batch from several worker threads; numpy
        # Generators are not thread-safe, so frame-index draws take this lock
        self._rng_lock = threading.Lock()

        ids_path = Path(packed_path).with_suffix(".ids.pickle")
        id_map = None
        if ids_path.exists():
            with open(ids_path, "rb") as f:
                id_map = pickle.load(f)

        self.video_idx, self.captions = [], []
        if captions is not None:
            caps = captions
            if isinstance(captions, (str, Path)):
                with open(captions, "rb") as f:
                    caps = pickle.load(f)
            for vid in caps:
                key = str(vid)
                if id_map is not None and key not in id_map:
                    continue
                idx = id_map[key] if id_map is not None else int(key)
                for cap in caps[vid]:
                    self.video_idx.append(idx)
                    self.captions.append(cap)
        else:
            self.video_idx = list(range(self.reader.num_videos))
            self.captions = [None] * len(self.video_idx)

    def __len__(self):
        return len(self.video_idx)

    def __getitem__(self, idx):
        """Per-item (video, encoded_caption) access — the same protocol as
        VideoDataset.__getitem__ (data/__init__.py), so packed datasets also work
        with per-item consumers (eval CLIs, Loader, benchmark). The hot training
        path should still use get_batch (one native gather per batch)."""
        vid = int(self.video_idx[idx])
        with self._rng_lock:
            fidx = pick_frames(self.reader.video_num_frames(vid), self.num_frames,
                               random=self.random_frames, rng=self.rng)
        raw = self.reader.read_batch(np.asarray([vid], np.int64), fidx[None])[0]
        frames = transform_frames(raw, self.frame_size, self.num_channels,
                                  normalize=self.normalize)
        caption = encode_caption(self.vocab, self.captions[idx]) \
            if self.vocab is not None and self.captions[idx] is not None else None
        return frames, caption

    def get_batch(self, idxs, max_caption_len=32):
        vids = np.asarray([self.video_idx[i] for i in idxs], dtype=np.int64)
        with self._rng_lock:
            fidx = np.stack([
                pick_frames(self.reader.video_num_frames(int(v)), self.num_frames,
                            random=self.random_frames, rng=self.rng)
                for v in vids])
        raw = self.reader.read_batch(vids, fidx)
        b, t = raw.shape[:2]
        frames = transform_frames(raw.reshape((-1,) + raw.shape[2:]),
                                  self.frame_size, self.num_channels,
                                  normalize=self.normalize)
        frames = frames.reshape((b, t) + frames.shape[1:])
        batch = {"video": frames}
        if self.vocab is not None and self.captions[0] is not None:
            caps = np.zeros((b, max_caption_len), np.int32)
            lengths = np.zeros((b,), np.int32)
            for i, j in enumerate(idxs):
                enc = encode_caption(self.vocab, self.captions[j])[:max_caption_len]
                caps[i, :len(enc)] = enc
                lengths[i] = len(enc)
            batch["captions"] = caps
            batch["lengths"] = lengths
        return batch


def packed_dataset(data=None, vocab=None, anno=None, num_frames=16, frame_size=None,
                   num_channels=3, normalize=True, random_frames=0, num_threads=8,
                   **_):
    """Config-surface factory (like my_dataset, for packed caches). Reachable from
    the training CLI via --data '{"class": "txt2vid_tpu.data.packed.packed_dataset",
    ...}' — get_loader dispatches batch-level datasets to BatchLoader."""
    return PackedVideoDataset(data, vocab=vocab, captions=anno,
                              num_frames=num_frames, frame_size=frame_size,
                              num_channels=num_channels, normalize=normalize,
                              random_frames=random_frames, num_threads=num_threads)


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(
        description="Pack a directory of per-video .npy caches into one T2VC file")
    parser.add_argument("--dir", required=True, help="directory of <vid>.npy caches")
    parser.add_argument("--out", required=True, help="output .t2vc path")
    args = parser.parse_args()
    id_map = pack_directory(args.dir, args.out)
    status(f"packed {len(id_map)} videos -> {args.out}")
