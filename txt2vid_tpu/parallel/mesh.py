"""Device mesh + sharding layer (the TPU-native replacement for the reference's
torch.nn.parallel.data_parallel scatter/gather, SURVEY.md §2.8).

Design: one `jax.sharding.Mesh` over all chips with a `dp` (data) axis; batches are
sharded over `dp`, parameters and optimizer state are replicated, and XLA inserts the
gradient all-reduce over ICI automatically when the jitted train step consumes sharded
batches with replicated-out params. TP axes can be added later by extending the mesh —
the models are far below the size where that pays (reference models ~1e8 params).
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "dp"):
    """Place a host batch dict onto the mesh, sharded over the batch dim."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def shard_train_state(state, mesh: Mesh):
    """Replicate a train state across the mesh."""
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)


def jit_train_step_sharded(train_step, mesh: Mesh, axis_name: str = "dp"):
    """jit the train step with explicit in/out shardings: state replicated, batch
    dp-sharded, key replicated. XLA turns the loss/grad means into psum over ICI."""
    rep = replicated(mesh)
    bs = batch_sharding(mesh, axis_name)
    return jax.jit(
        train_step,
        in_shardings=(rep, bs, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),   # reuse the old state's buffers for the new state
    )
