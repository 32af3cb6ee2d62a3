"""Checkpoint save/restore (reference gan/trainer.py:269-279 + cond_gan.py:186-217).

The reference torch.saves a flat dict {optG, optD, gen, cond, sample_mapping,
<discrim-name>...} with loss-encoded filenames and does NOT save the iteration count
(resumes restart epoch numbering). Here the full GanTrainState — params, batch stats,
both optimizer states, AND the step — is serialized with flax msgpack into a single
file; `iter_%d_lossG_%.4f_lossD_%.4f` filenames are kept for parity.
"""

import os
import threading
from pathlib import Path

import jax
import numpy as np
from flax import serialization

from txt2vid_tpu.utils.misc import ensure_exists


def checkpoint_name(iteration: int, loss_g: float, loss_d: float) -> str:
    return f"iter_{iteration}_lossG_{loss_g:.4f}_lossD_{loss_d:.4f}"


def save_state(state, path: str) -> str:
    """Serialize a pytree (e.g. GanTrainState) to msgpack bytes at `path`."""
    ensure_exists(str(Path(path).parent))
    host_state = jax.device_get(state)
    data = serialization.to_bytes(host_state)
    tmp = str(path) + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return str(path)


class AsyncCheckpointer:
    """Background-thread checkpointing: the device->host pull + serialization of a
    multi-GB train state can stall the train loop for minutes on slow transports.
    At most one save is in flight; a save requested while one is running is QUEUED
    (latest-wins, one slot) and started when the in-flight save finishes — so slow
    storage degrades checkpoint freshness, never checkpoint density to zero."""

    def __init__(self, save_fn=None, snapshot: str = "device"):
        """snapshot="device" (default): snapshot via an on-device copy — the
        transfer then overlaps training, but the copy costs a full extra state
        in HBM until the save finishes (and a queued pending save holds a
        second one). snapshot="host": pull the state to host SYNCHRONOUSLY at
        enqueue (zero extra HBM, caller stalls for the d2h) and leave only
        serialization + file IO to the thread — required for models that run
        near HBM capacity (the 3-scale cond-128 arm OOM'd in a concurrent
        device-snapshot save, RESULTS.md round 3)."""
        assert snapshot in ("device", "host"), snapshot
        self._save_fn = save_fn or save_state   # injectable for tests
        self._snapshot = snapshot
        self._lock = threading.Lock()
        self._thread = None
        self._pending = None                     # (state_snapshot, path) | None

    def save(self, state, path: str) -> bool:
        """Returns True if the save started immediately, False if queued."""
        # snapshot first: the train step DONATES the live state's buffers, so
        # the background thread must not read them after the next step
        if self._snapshot == "host":
            snap = jax.device_get(state)
        else:
            snap = jax.tree_util.tree_map(
                lambda a: a.copy() if hasattr(a, "copy") else a, state)
        with self._lock:
            if self._thread is not None and self._thread.is_alive():
                if self._pending is not None:
                    from txt2vid_tpu.utils.logging import warn
                    warn(f"checkpoint backlog: {self._pending[1]} superseded by {path}")
                self._pending = (snap, path)
                return False
            self._start_locked(snap, path)
            return True

    def _start_locked(self, state, path):
        def run():
            try:
                self._save_fn(state, path)
            finally:
                with self._lock:
                    if self._pending is not None:
                        nxt_state, nxt_path = self._pending
                        self._pending = None
                        self._start_locked(nxt_state, nxt_path)
        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def wait(self):
        """Block until every started AND queued save has completed."""
        while True:
            with self._lock:
                t = self._thread
                idle = (t is None or not t.is_alive()) and self._pending is None
            if idle:
                return
            if t is not None:
                t.join()


def restore_state(template, path: str):
    """Restore into the structure of `template` (an initialized state).

    Leaves are cast to the template's dtypes: optimizer-moment STORAGE formats
    (--bf16 / --bf16_nu, ops/optim.py adam_storage) are run-config, not
    state identity — an f32-trail checkpoint must resume under a bf16-moment
    config (and vice versa) without changing the jitted step's input
    signature mid-run (a dtype mismatch forces a second 13-15 min flagship
    compile after the first step re-materializes the moments in the
    config's dtype)."""
    with open(path, "rb") as f:
        data = f.read()
    restored = serialization.from_bytes(template, data)

    def cast_like(t, r):
        if hasattr(t, "dtype") and hasattr(r, "dtype") and r.dtype != t.dtype:
            return r.astype(t.dtype)
        return r

    return jax.tree_util.tree_map(cast_like, template, restored)


def restore_txt_vars(path: str):
    """Load sentence-encoder variables from a txt-pretrain checkpoint
    ({"optim": ..., "txt": {"params": ...}}, train/txt.py) or a bare variables
    pickle — template-free, so the (unknown) optimizer structure doesn't matter.
    Mirrors the reference's whole-object torch.load handoff (train/gan.py:40-42)."""
    from flax.serialization import msgpack_restore

    with open(path, "rb") as f:
        raw = msgpack_restore(f.read())
    if isinstance(raw, dict) and "txt" in raw:
        raw = raw["txt"]
    assert isinstance(raw, dict) and "params" in raw, \
        f"unrecognized sentence checkpoint structure in {path}"
    return raw


def latest_checkpoint(out_dir: str) -> str | None:
    """Most recent iter_* checkpoint in a directory, by iteration number."""
    cands = []
    p = Path(out_dir)
    if not p.exists():
        return None
    for f in p.iterdir():
        # sibling artifacts (e.g. the gan/ema.py <checkpoint>.ema tree) are
        # not restorable states
        if f.name.startswith("iter_") and not f.name.endswith(".ema"):
            try:
                cands.append((int(f.name.split("_")[1]), f))
            except (IndexError, ValueError):
                continue
    if not cands:
        return None
    return str(max(cands)[1])
