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
    At most one save is in flight; a save requested while busy is dropped with a
    warning (the next period's save will cover it)."""

    def __init__(self):
        self._thread = None

    def save(self, state, path: str) -> bool:
        if self._thread is not None and self._thread.is_alive():
            from txt2vid_tpu.utils.logging import warn
            warn(f"previous checkpoint save still in flight; skipping {path}")
            return False
        # device-side snapshot first: the train step DONATES the live state's
        # buffers, so the background thread must not read them after the next step
        state = jax.tree_util.tree_map(
            lambda a: a.copy() if hasattr(a, "copy") else a, state)
        self._thread = threading.Thread(target=save_state, args=(state, path),
                                        daemon=True)
        self._thread.start()
        return True

    def wait(self):
        if self._thread is not None:
            self._thread.join()


def restore_state(template, path: str):
    """Restore into the structure of `template` (an initialized state)."""
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)


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
        if f.name.startswith("iter_"):
            try:
                cands.append((int(f.name.split("_")[1]), f))
            except (IndexError, ValueError):
                continue
    if not cands:
        return None
    return str(max(cands)[1])
