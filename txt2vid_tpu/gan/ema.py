"""Exponential moving average of generator parameters (``--g_ema``).

The reference has no EMA — its sampling always used the live generator
(reference gan/trainer.py:44-90) — but EMA sampling is the standard GAN
capability lever (ProGAN/StyleGAN lineage): the averaged generator smooths
the optimizer's oscillation around the adversarial equilibrium and typically
samples markedly better than any single iterate, for one elementwise lerp per
step of cost.

Deliberately managed OUTSIDE the compiled train step, as its own tiny jitted
program driven by the trainer:

  1. the train-step program stays byte-identical with EMA on or off — at the
     3-scale cond-128 flagship shape the TPU backend's compilation of the D
     backward has flipped finite<->NaN with program composition three separate
     times (RESULTS.md round 3: fused clip, split-out GP vjp, barrier
     variants), so nothing that doesn't need to live in that program is
     allowed to;
  2. the GanTrainState pytree is unchanged, so EMA and non-EMA runs share
     checkpoints in both directions — the EMA tree rides in a sibling
     ``<checkpoint>.ema`` msgpack file, and a missing sibling just means the
     EMA restarts from the restored live params.

With ``--steps_per_dispatch k`` the trainer updates the EMA once per dispatch
with decay ``d**k`` — the standard endpoint approximation (the k-1
intermediate iterates are skipped; they are one optimizer step apart, far
inside the average's time constant).
"""

import functools

import jax
import jax.numpy as jnp
from flax import serialization


def make_ema_update(decay: float, steps_per_dispatch: int = 1):
    """Jitted ``ema <- ema + (1 - decay**k) * (params - ema)``.

    The EMA buffers are donated (the previous tree is dead after the update);
    ``params`` is only read, so the live state's donation discipline in the
    train step is unaffected.
    """
    d = float(decay) ** int(steps_per_dispatch)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def update(ema, params):
        return jax.tree_util.tree_map(
            lambda e, p: e + (1.0 - d) * (p.astype(e.dtype) - e), ema, params)

    return update


def init_ema(params):
    """A device COPY of the generator params (copy, not alias: the live
    state's buffers are donated into the next train step, and a shared buffer
    would be deleted under the EMA tree)."""
    return jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True), params)


def ema_path(checkpoint_path: str) -> str:
    return str(checkpoint_path) + ".ema"


def save_ema(ema, checkpoint_path: str) -> str:
    """Serialize the EMA tree next to its checkpoint (``save_state`` shape,
    reusable with AsyncCheckpointer via functools.partial)."""
    from txt2vid_tpu.utils.checkpoint import save_state

    return save_state(ema, ema_path(checkpoint_path))


def load_ema(checkpoint_path: str, template):
    """Restore the sibling ``.ema`` tree for a checkpoint, or None when the
    checkpoint predates EMA / was written by a non-EMA run."""
    import os

    path = ema_path(checkpoint_path)
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def with_ema_params(g_vars, ema):
    """The generator variables with EMA params swapped in (for sampling)."""
    out = dict(g_vars)
    out["params"] = ema
    return out
