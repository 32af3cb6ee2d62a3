"""Data layer (reference txt2vid/data/__init__.py re-designed as a host-side numpy
pipeline feeding the device).

Components:
  * Vocab — exact reference tokenizer semantics (data/__init__.py:260-316): specials
    <pad>=0, <start>, <end>, <unk>; lowercasing; split-on-space with a trailing '.'
    emitted as <end>.
  * VideoDataset — indexes a {video_id: [captions]} pickle into (video, caption)
    pairs, skipping missing videos (reference :158-199); reads frame caches (packed
    .npy or per-frame JPEG dirs) picking `num_frames` evenly spaced frames
    (reference :201-255, pick_frames :107-116 — whose broken random path is replaced
    by a working uniform-sample option).
  * collate — pads captions to a fixed max length and returns lengths. Unlike the
    reference's sort-by-length packing (:326-355), XLA wants static shapes: captions
    pad to `max_caption_len` and the LSTM masks by length.
  * Loader — shuffling epoch iterator with a background thread pool for decode and a
    device prefetcher (the reference's data_prefetcher side-stream, :131-156, maps to
    async jax.device_put double-buffering).
"""

import pickle
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

from txt2vid_tpu.utils.misc import load_pickle


class Vocab:
    START = "<start>"
    END = "<end>"
    UNKNOWN = "<unk>"
    PAD = "<pad>"  # always index 0

    def __init__(self):
        self.word2idx = {}
        self.idx2word = {}
        self.idx = 0
        for w in (self.PAD, self.START, self.END, self.UNKNOWN):
            self.add_word(w)

    def add_word(self, word):
        word = word.lower()
        if word not in self.word2idx:
            self.word2idx[word] = self.idx
            self.idx2word[self.idx] = word
            self.idx += 1

    def get_word(self, idx):
        return self.idx2word.get(idx, self.UNKNOWN)

    def __call__(self, word):
        word = word.lower()
        return self.word2idx.get(word, self.word2idx[self.UNKNOWN])

    def __len__(self):
        return len(self.word2idx)

    def tokenize(self, sentence):
        yield self.START
        for word in sentence.split():
            if word and word[-1] == ".":
                yield word[:-1]
                yield self.END
            else:
                yield word

    def to_words(self, tokens):
        result = ""
        for i, tok in enumerate(tokens):
            word = self.get_word(int(tok))
            if word != self.END and i != 0:
                result += " "
            result += word
        return result


def build_vocab(sentences):
    vocab = Vocab()
    for sent in sentences:
        for word in vocab.tokenize(sent):
            vocab.add_word(word)
    return vocab


def pick_frames(num_available: int, num_frames: int = 16, random: bool = False,
                rng: np.random.Generator | None = None) -> np.ndarray:
    """Evenly-spaced (reference pick_frames :109-116) or sorted-uniform-random frame
    indices (the reference's random path, :117-128, is broken; this is its evident
    intent)."""
    if not random:
        factor = num_available // num_frames
        return np.arange(num_frames) * max(factor, 1)
    rng = rng or np.random.default_rng()
    idx = rng.permutation(num_available)[:num_frames]
    idx.sort()
    return idx


def encode_caption(vocab: Vocab, caption: str) -> np.ndarray:
    toks = [vocab(t) for t in vocab.tokenize(caption)]
    if toks[-1] != vocab(vocab.END):
        toks.append(vocab(vocab.END))
    return np.asarray(toks, dtype=np.int32)


def load_video_frames(path: Path, num_frames: int = 16, frame_size: int | None = None,
                      num_channels: int = 3, random_frames: bool = False,
                      rng=None, normalize: bool = True) -> np.ndarray:
    """Read a cached video as float32 (T, H, W, C) in [-1, 1].

    Supports: `<vid>.npy` packed uint8 (T, H, W, C) — the fast path — or a directory
    of `<n>.jpg`/`.png` frames (the reference's cache layout, create_cache_2.py)."""
    if path.suffix == ".npy" or path.with_suffix(".npy").exists():
        p = path if path.suffix == ".npy" else path.with_suffix(".npy")
        arr = np.load(p, mmap_mode="r")
        idx = pick_frames(arr.shape[0], num_frames, random_frames, rng)
        frames = np.asarray(arr[idx])
    else:
        names = sorted((int(f.stem) for f in path.iterdir()
                        if f.suffix in (".jpg", ".png")))
        idx = pick_frames(len(names), num_frames, random_frames, rng)
        from PIL import Image
        frames = np.stack([
            np.asarray(Image.open(path / f"{names[i]}.jpg"
                                  if (path / f"{names[i]}.jpg").exists()
                                  else path / f"{names[i]}.png"))
            for i in idx])
    if frames.ndim == 3:
        frames = frames[..., None]
    return transform_frames(frames, frame_size, num_channels, normalize=normalize)


def transform_frames(frames: np.ndarray, frame_size: int | None,
                     num_channels: int, normalize: bool = True) -> np.ndarray:
    """Center-crop + channel policy + [-1, 1] normalization (the reference
    default_transform, data/__init__.py:357-370). normalize=False keeps uint8 —
    the train step normalizes on-device, quartering host->device traffic."""
    t, h, w, c = frames.shape
    if frame_size is not None and (h < frame_size or w < frame_size):
        # torchvision CenterCrop pads smaller images with zeros before cropping
        # (the reference's CIFAR-10 32px -> 64px path, data/__init__.py:357-374)
        ph, pw = max(0, frame_size - h), max(0, frame_size - w)
        frames = np.pad(frames, ((0, 0), (ph // 2, ph - ph // 2),
                                 (pw // 2, pw - pw // 2), (0, 0)))
        t, h, w, c = frames.shape
    if frame_size is not None and (h != frame_size or w != frame_size):
        top = max(0, (h - frame_size) // 2)
        left = max(0, (w - frame_size) // 2)
        frames = frames[:, top:top + frame_size, left:left + frame_size]
    if num_channels == 1 and frames.shape[-1] == 3:
        # ITU-R 601 luma, as PIL Grayscale
        luma = frames @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
        frames = luma[..., None]
        if not normalize:
            frames = frames.astype(np.uint8)
    elif num_channels == 3 and frames.shape[-1] == 1:
        frames = np.repeat(frames, 3, axis=-1)
    if not normalize:
        return np.ascontiguousarray(frames)
    frames = frames.astype(np.float32) / 255.0
    return frames * 2.0 - 1.0


class VideoDataset:
    """(video, caption) pairs over a frame cache + captions pickle."""

    def __init__(self, video_dir=None, vocab=None, captions=None, num_frames=16,
                 frame_size=None, num_channels=3, random_frames=0, normalize=True):
        self.video_dir = Path(video_dir)
        self.vocab = vocab
        self.num_frames = num_frames
        self.frame_size = frame_size
        self.num_channels = num_channels
        self.random_frames = bool(random_frames)
        self.normalize = normalize

        caps = load_pickle(captions) if isinstance(captions, (str, Path)) else captions
        self.video_ids, self.captions = [], []
        self.missing = 0
        for vid in caps:
            p = self.video_dir / str(vid)
            if not (p.exists() or p.with_suffix(".npy").exists()):
                self.missing += 1
                continue
            for cap in caps[vid]:
                self.video_ids.append(str(vid))
                self.captions.append(cap)
        if self.missing:
            print(f"Missing: {self.missing} videos")

    def __len__(self):
        return len(self.captions)

    def __getitem__(self, idx):
        vid = self.video_ids[idx]
        frames = load_video_frames(self.video_dir / vid, self.num_frames,
                                   self.frame_size, self.num_channels,
                                   self.random_frames, normalize=self.normalize)
        caption = encode_caption(self.vocab, self.captions[idx]) \
            if self.vocab is not None else None
        return frames, caption


def collate(items, max_caption_len: int = 32):
    """Batch (video, caption) pairs: videos stacked; captions padded to a STATIC
    max_caption_len (XLA static shapes; reference pads to the batch max, :326-355)."""
    vids = np.stack([v for v, _ in items])
    if items[0][1] is None:
        return {"video": vids}
    lengths = np.asarray([min(len(c), max_caption_len) for _, c in items],
                         dtype=np.int32)
    caps = np.zeros((len(items), max_caption_len), dtype=np.int32)
    for i, (_, c) in enumerate(items):
        caps[i, :lengths[i]] = c[:max_caption_len]
    return {"video": vids, "captions": caps, "lengths": lengths}


class Loader:
    """Shuffling epoch iterator with threaded decode + host->device prefetch."""

    def __init__(self, dataset, batch_size=64, shuffle=True, num_workers=4,
                 max_caption_len=32, seed=0, drop_last=True, device_prefetch=2,
                 to_device=True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.max_caption_len = max_caption_len
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last
        self.device_prefetch = device_prefetch
        # to_device=False yields host numpy batches — callers that shard over a mesh
        # must device_put exactly once themselves (a device round-trip is expensive
        # on remote transports)
        self.to_device = to_device

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def _batches(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        n = len(self)
        for b in range(n):
            yield order[b * self.batch_size:(b + 1) * self.batch_size]

    def __iter__(self):
        import jax

        def load_batch(idxs):
            items = [self.dataset[int(i)] for i in idxs]
            return collate(items, self.max_caption_len)

        # Bounded decode-ahead: at most num_workers + 1 decoded batches in flight
        # plus device_prefetch + 1 device-side — a slow consumer can never pile the
        # whole epoch up on the host (the BatchLoader pattern).
        slices = list(self._batches())
        with ThreadPoolExecutor(max_workers=self.num_workers) as ex:
            ahead = self.num_workers + 1
            futs = [ex.submit(load_batch, s) for s in slices[:ahead]]
            nxt = ahead
            pending = []
            while futs:
                batch = futs.pop(0).result()
                if nxt < len(slices):
                    futs.append(ex.submit(load_batch, slices[nxt]))
                    nxt += 1
                # async H2D: device_put returns immediately; keeping `device_prefetch`
                # batches in flight overlaps the copy with the train step (the
                # reference's CUDA-side-stream prefetcher, data/__init__.py:131-156)
                pending.append(jax.device_put(batch) if self.to_device else batch)
                if len(pending) > self.device_prefetch:
                    yield pending.pop(0)
            for b in pending:
                yield b


class BatchLoader:
    """Epoch iterator over a BATCH-level dataset — one that assembles whole batches
    itself (duck type: `.get_batch(idxs, max_caption_len) -> batch dict`), e.g.
    PackedVideoDataset whose gather is a single GIL-free native call. Worker threads
    keep `num_workers + 1` batches in flight ahead of the consumer (the fast-input
    role of the reference's DALI import + DataLoader workers,
    data/__init__.py:16-84,379-383)."""

    def __init__(self, dataset, batch_size=64, shuffle=True, num_workers=2,
                 max_caption_len=32, seed=0, drop_last=True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(num_workers, 1)
        self.max_caption_len = max_caption_len
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        slices = [order[b * self.batch_size:(b + 1) * self.batch_size]
                  for b in range(len(self))]
        with ThreadPoolExecutor(max_workers=self.num_workers) as ex:
            ahead = self.num_workers + 1
            futs = [ex.submit(self.dataset.get_batch, s, self.max_caption_len)
                    for s in slices[:ahead]]
            for s in slices[ahead:]:
                nxt = ex.submit(self.dataset.get_batch, s, self.max_caption_len)
                yield futs.pop(0).result()
                futs.append(nxt)
            for f in futs:
                yield f.result()


# ------------------------------------------------------------------ factories
# (reference data/__init__.py:372-383; these names are part of the config surface)

def my_dataset(data=None, vocab=None, anno=None, transform=None, random_frames=0,
               num_frames=16, frame_size=None, num_channels=3, normalize=True, **_):
    return VideoDataset(video_dir=data, vocab=vocab, captions=anno,
                        num_frames=num_frames, frame_size=frame_size,
                        num_channels=num_channels, random_frames=random_frames,
                        normalize=normalize)


def cifar10_dataset(data=None, vocab=None, anno=None, transform=None, frame_size=None,
                    num_channels=3, **_):
    from txt2vid_tpu.data.cifar10 import Cifar10Dataset
    return Cifar10Dataset(data, frame_size=frame_size, num_channels=num_channels)


class ShardedView:
    """Process-local slice of a dataset for multi-host data feeding: local item
    i is global item i * num_shards + shard (strided so every process sees the
    same label/length distribution), with the ragged tail dropped so all
    processes run the same number of batches per epoch (they must stay
    step-synchronized — a short process would hang the others' collectives).
    Works for both item-level datasets (__getitem__) and batch-level ones
    (.get_batch); other attributes delegate to the base dataset."""

    def __init__(self, dataset, shard: int, num_shards: int):
        assert 0 <= shard < num_shards
        self.dataset = dataset
        self.shard = shard
        self.num_shards = num_shards

    def __len__(self):
        return len(self.dataset) // self.num_shards

    def _global(self, i):
        return int(i) * self.num_shards + self.shard

    def __getitem__(self, i):
        return self.dataset[self._global(i)]

    def __getattr__(self, name):
        # get_batch must only EXIST when the base dataset has one (get_loader
        # dispatches BatchLoader on hasattr), so it is provided here, not as a
        # class method
        attr = getattr(self.dataset, name)
        if name == "get_batch":
            def wrapped(idxs, *a, **kw):
                return attr(np.asarray([self._global(i) for i in idxs]), *a, **kw)
            return wrapped
        return attr


def get_loader(dset=None, batch_size=64, val=False, num_workers=4,
               has_captions=False, max_caption_len=32, seed=0, to_device=True):
    if hasattr(dset, "get_batch"):   # batch-level datasets (packed native path)
        return BatchLoader(dset, batch_size=batch_size, shuffle=not val,
                           num_workers=num_workers,
                           max_caption_len=max_caption_len, seed=seed)
    return Loader(dset, batch_size=batch_size, shuffle=not val,
                  num_workers=num_workers, max_caption_len=max_caption_len, seed=seed,
                  to_device=to_device)


def main(args):
    """Vocab-build CLI (reference data/__init__.py:385-404)."""
    ex_to_sent = load_pickle(args.sents)
    sentences = [s for x in ex_to_sent for s in ex_to_sent[x]]
    vocab = build_vocab(sentences)
    print(f"vocab size: {len(vocab)}")
    with open(args.out, "wb") as f:
        pickle.dump(vocab, f)


if __name__ == "__main__":
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument("--sents", type=str, required=True,
                        help="sentence pickle {key: [sentences]}")
    parser.add_argument("--out", type=str, required=True, help="output vocab pickle")
    main(parser.parse_args())
