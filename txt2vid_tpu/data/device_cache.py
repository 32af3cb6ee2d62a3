"""Device-resident dataset: the packed video cache uploaded to HBM ONCE, with
batch assembly (pair draw, frame selection, gather, caption lookup) INSIDE the
compiled train step.

Motivation, in order:
  1. TPU-native input: the hot loop's data dependency becomes one on-device
     gather from a uint8 HBM buffer — zero per-step host decode, zero per-step
     host->device transfer, no loader stall (the 128px/32f run measured
     0.06-0.2 s/iter of batch-load wait on the streaming path).
  2. The axon remote transport RETAINS every H2D byte on the host (measured
     16.4 MB leaked per 16.7 MB device_put — see RESULTS.md round 3): streaming
     batches OOMs any long run at ~125 GB cumulative transfer. A one-time
     upload caps the leak at the dataset size.

The reference's counterpart is the (dead) DALI GPU pipeline (reference
data/__init__.py:16-84), which moved JPEG decode to the accelerator; this moves
residence too, which only makes sense because the packed cache is uint8 and
fits HBM (synthetic_big: 1.0 GB for 8000 videos @ 32f/64px/1ch vs 16 GB HBM).
For datasets larger than HBM, use the streaming packed path (data/packed.py).

Semantics vs the streaming loader (documented deviations):
  * pairs are drawn i.i.d. uniform WITH replacement per step (epoch = len/batch
    draws), not an epoch-shuffled permutation — indistinguishable for GAN
    training and it keeps the draw a single traced randint;
  * frame selection is the deterministic evenly-spaced pick_frames grid
    (reference data/__init__.py:109-116), optionally with a random temporal
    phase per step (`random_phase`) — the reference's broken random path is not
    reproduced.
"""

from typing import Any

import numpy as np


class DeviceVideoData:
    """Host-side container (uint8 videos + caption matrix) with a one-time
    device placement and a traced batch assembler."""

    def __init__(self, videos: np.ndarray, vid_idx: np.ndarray,
                 captions: np.ndarray | None, lengths: np.ndarray | None,
                 num_frames: int, random_phase: bool = False):
        assert videos.dtype == np.uint8 and videos.ndim == 5
        self.videos = videos                    # (N, T, H, W, C) uint8
        self.vid_idx = vid_idx.astype(np.int32)  # (P,) pair -> video row
        self.captions = captions                # (P, L) int32 | None
        self.lengths = lengths                  # (P,) int32 | None
        self.num_frames = int(num_frames)
        self.random_phase = bool(random_phase)
        t = videos.shape[1]
        assert self.num_frames <= t, (self.num_frames, t)
        self._frame_stride = max(t // self.num_frames, 1)
        self._device = None

    # ------------------------------------------------------------------ build
    @classmethod
    def from_packed(cls, packed_path, captions=None, vocab=None,
                    max_caption_len: int = 32, num_frames: int = 16,
                    frame_size: int | None = None, num_channels: int = 3,
                    random_phase: bool = False):
        """Load EVERY video of a uniform-shape packed cache (data/packed.py),
        preprocessed to final size/channels on the host once."""
        from txt2vid_tpu.data.packed import PackedVideoDataset

        dset = PackedVideoDataset(packed_path, vocab=vocab, captions=captions,
                                  num_frames=num_frames, frame_size=frame_size,
                                  num_channels=num_channels, normalize=False)
        return cls.from_dataset(dset, max_caption_len=max_caption_len,
                                random_phase=random_phase)

    @classmethod
    def from_dataset(cls, dset, max_caption_len: int = 32,
                     random_phase: bool = False):
        """Build from an already-constructed PackedVideoDataset (the --data
        config surface object)."""
        from txt2vid_tpu.data import encode_caption, transform_frames

        frame_size = dset.frame_size
        num_channels = dset.num_channels
        num_frames = dset.num_frames
        reader = dset.reader
        n = reader.num_videos
        t0 = reader.video_num_frames(0)
        for i in range(n):
            assert reader.video_num_frames(i) == t0, \
                "device cache needs uniform frame counts; repack with a fixed T"
        full = np.arange(t0)[None].repeat(n, 0)
        raw = reader.read_batch(np.arange(n, dtype=np.int64), full)
        vids = np.stack([
            transform_frames(v, frame_size, num_channels, normalize=False)
            for v in raw])

        caps = lens = None
        if dset.vocab is not None and dset.captions and dset.captions[0] is not None:
            p = len(dset.captions)
            caps = np.zeros((p, max_caption_len), np.int32)
            lens = np.zeros((p,), np.int32)
            for i, c in enumerate(dset.captions):
                enc = encode_caption(dset.vocab, c)[:max_caption_len]
                caps[i, :len(enc)] = enc
                lens[i] = len(enc)
        return cls(vids, np.asarray(dset.video_idx), caps, lens,
                   num_frames=num_frames, random_phase=random_phase)

    # ------------------------------------------------------------ device side
    @property
    def num_pairs(self) -> int:
        return len(self.vid_idx)

    def device_arrays(self, mesh=None) -> dict[str, Any]:
        """Upload once (replicated over the mesh so every dp shard gathers its
        batch rows locally); cached."""
        import jax

        if self._device is None:
            put = jax.device_put
            if mesh is not None:
                from txt2vid_tpu.parallel.mesh import replicated
                sh = replicated(mesh)
                put = lambda x: jax.device_put(x, sh)
            d = {"videos": put(self.videos), "vid_idx": put(self.vid_idx)}
            if self.captions is not None:
                d["captions"] = put(self.captions)
                d["lengths"] = put(self.lengths)
            self._device = d
        return self._device

    def assemble(self, arrays, key, batch_size: int):
        """Traced: draw a batch from the device-resident arrays. Returns the
        standard batch dict (uint8 video — the train step normalizes on
        device, gan/train_step.py:171-173)."""
        import jax
        import jax.numpy as jnp

        ki, kp = jax.random.split(key)
        idx = jax.random.randint(ki, (batch_size,), 0, self.num_pairs)
        rows = arrays["vid_idx"][idx]
        vids = arrays["videos"][rows]                       # (B, T, H, W, C)
        t = vids.shape[1]
        if self.num_frames < t:
            stride = self._frame_stride
            base = jnp.arange(self.num_frames) * stride
            if self.random_phase:
                base = base + jax.random.randint(kp, (), 0, stride)
            vids = jnp.take(vids, base, axis=1)
        batch = {"video": vids}
        if "captions" in arrays:
            batch["captions"] = arrays["captions"][idx]
            batch["lengths"] = arrays["lengths"][idx]
        return batch

    # -------------------------------------------------------------- host side
    def host_batch(self, idxs) -> dict[str, Any]:
        """Host-numpy batch (for init templates and the trainer's real-sample
        grids) — never device_put by callers."""
        idxs = np.asarray(idxs) % self.num_pairs
        rows = self.vid_idx[idxs]
        vids = self.videos[rows]
        t = vids.shape[1]
        if self.num_frames < t:
            vids = vids[:, np.arange(self.num_frames) * self._frame_stride]
        batch = {"video": vids}
        if self.captions is not None:
            batch["captions"] = self.captions[idxs]
            batch["lengths"] = self.lengths[idxs]
        return batch


def jit_device_data_step(train_step, data: DeviceVideoData, mesh,
                         batch_size: int, axis_name: str = "dp",
                         state_shardings=None):
    """jit the train step with ON-DEVICE batch assembly. The returned callable
    keeps the trainer's (state, batch, key) signature but IGNORES the host batch
    — the compiled program draws its own from the device-resident dataset,
    keyed by the on-device step counter (fresh data every step, zero host work).
    State replicated+donated, dataset replicated, assembled batch re-sharded to
    the dp axis before the step body (local slice of a local gather)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from txt2vid_tpu.parallel.mesh import batch_sharding, replicated

    rep = replicated(mesh)
    ss = rep if state_shardings is None else state_shardings
    if state_shardings is not None:
        # explicit ZeRO-3 schedule (parallel/mesh._fsdp_gather_step): gather
        # weights at use, avoid GSPMD's involuntary-remat resharding in the
        # conv backward
        from txt2vid_tpu.parallel.mesh import _fsdp_gather_step
        train_step = _fsdp_gather_step(train_step, state_shardings, mesh)
    bs = batch_sharding(mesh, axis_name)
    arrays = data.device_arrays(mesh)

    def step(state, arrays, key):
        bkey = jax.random.fold_in(jax.random.fold_in(key, state.step), 0xda7a)
        batch = data.assemble(arrays, bkey, batch_size)
        batch = jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, bs), batch)
        return train_step(state, batch, key)

    from txt2vid_tpu.parallel.mesh import _donate
    jitted = jax.jit(step, in_shardings=(ss, rep, rep),
                     out_shardings=(ss, rep), donate_argnums=_donate())

    def run(state, _host_batch_ignored, key):
        return jitted(state, arrays, key)

    return run


def jit_device_data_split(d_grad_step, clip_step, apply_step,
                          data: DeviceVideoData, mesh, batch_size: int,
                          axis_name: str = "dp", state_shardings=None):
    """Split-dispatch (--clip_grad_split) composition of jit_device_data_step:
    the D-grad and apply programs EACH assemble the same batch on device from
    the resident dataset (the assembly key is derived from (key, state.step),
    so the two programs draw identical batches — a cheap gather per program
    beats carrying a batch-sized tensor across the dispatch boundary)."""
    import jax

    from txt2vid_tpu.parallel.mesh import _donate, batch_sharding, replicated

    assert state_shardings is None, \
        "--clip_grad_split with fsdp state shardings is not supported"
    rep = replicated(mesh)
    bs = batch_sharding(mesh, axis_name)
    arrays = data.device_arrays(mesh)

    def assemble(state, arrays, key):
        bkey = jax.random.fold_in(jax.random.fold_in(key, state.step), 0xda7a)
        batch = data.assemble(arrays, bkey, batch_size)
        return jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, bs), batch)

    def grad_prog(state, arrays, key):
        return d_grad_step(state, assemble(state, arrays, key), key)

    def apply_prog(state, arrays, key, grads, norm, loss_d):
        return apply_step(state, assemble(state, arrays, key), key,
                          grads, norm, loss_d)

    jit_grad = jax.jit(grad_prog, in_shardings=(rep, rep, rep),
                       out_shardings=rep)
    jit_clip = jax.jit(clip_step, donate_argnums=(0,))
    jit_apply = jax.jit(apply_prog,
                        in_shardings=(rep, rep, rep, rep, rep, rep),
                        out_shardings=(rep, rep),
                        donate_argnums=_donate() + (
                            (3,) if not jax.config.jax_debug_nans else ()))

    def run(state, _host_batch_ignored, key):
        grads, loss_d = jit_grad(state, arrays, key)
        grads, norm = jit_clip(grads)
        return jit_apply(state, arrays, key, grads, norm, loss_d)

    return run


class DeviceEpochIterator:
    """Trainer-facing dataset adapter for device-data mode: yields HOST batches
    (numpy views, never device_put) that the trainer only uses for the
    real-sample grids and caption dumps; the compiled step ignores them."""

    def __init__(self, data: DeviceVideoData, batch_size: int, seed: int = 0,
                 rotate: int = 4):
        self.data = data
        self.batch_size = batch_size
        n = max(data.num_pairs // batch_size, 1)
        self._len = n
        rng = np.random.default_rng(seed)
        self._host = [data.host_batch(rng.integers(0, data.num_pairs, batch_size))
                      for _ in range(min(rotate, n))]

    def __len__(self):
        return self._len

    def __iter__(self):
        for i in range(self._len):
            yield self._host[i % len(self._host)]
