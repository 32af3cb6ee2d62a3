"""Device mesh + sharding layer (the TPU-native replacement for the reference's
torch.nn.parallel.data_parallel scatter/gather, SURVEY.md §2.8).

Design: one `jax.sharding.Mesh` over all chips with a `dp` (data) axis; batches are
sharded over `dp`, parameters and optimizer state are replicated, and XLA inserts the
gradient all-reduce over ICI automatically when the jitted train step consumes sharded
batches with replicated-out params. An optional `sp` axis ring-shards non-local
attention tokens (ops/ring_attention.py). TP axes can be added later by extending the
mesh — the models are far below the size where that pays (reference ~1e8 params).

BatchNorm semantics under dp (deliberate design decision): batch statistics are
GLOBAL-batch — XLA turns the BN mean/var reductions over the dp-sharded batch into
cross-replica reductions. The reference's DataParallel computed per-GPU-shard stats
(an artifact of replicate/scatter, not a choice); global stats are the mathematically
stated algorithm, make training invariant to device count (verified:
tests/test_infra.py dp=1 vs dp=8 numerical-equivalence), and cost one small ICI
reduction that overlaps with compute. Per-shard BN is intentionally NOT offered —
results would silently depend on the mesh shape.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "dp",
              sp: int = 1) -> Mesh:
    """dp mesh, or a (dp, sp) mesh when sp > 1 — the sequence-parallel axis feeds
    ops.attention.sequence_parallel / ring attention for long-clip configs."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if sp > 1:
        assert len(devices) % sp == 0, f"{len(devices)} devices not divisible by sp={sp}"
        return Mesh(np.array(devices).reshape(len(devices) // sp, sp),
                    (axis_name, "sp"))
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


def prefetch_to_mesh(iterator, mesh: Mesh, depth: int = 2, axis_name: str = "dp",
                     transform=None, stack: int = 1):
    """Asynchronously place host batches onto the mesh (batch dim sharded over
    `axis_name`), keeping `depth` batches in flight ahead of the consumer.

    jax.device_put returns immediately; by the time the train step consumes a
    yielded batch its H2D copy has overlapped with the previous step's compute —
    the role of the reference's CUDA side-stream data_prefetcher
    (data/__init__.py:131-156), without a synchronous placement in the hot loop.

    stack > 1 groups `stack` consecutive batches into one leading-axis stack
    (sharded P(None, axis)) for the scanned multi-step train program
    (jit_scanned_train_step_sharded); a trailing partial group is dropped, like
    a drop-last batch."""
    if stack > 1:
        sh = NamedSharding(mesh, P(None, axis_name))
    else:
        sh = batch_sharding(mesh, axis_name)

    def put(batch):
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)

    if transform is not None:
        # per-BATCH transform (e.g. the img_model frame slice) must see plain
        # (B, ...) batches, so it runs before any stacking
        iterator = (transform(b) for b in iterator)

    if stack > 1:
        def grouped(it):
            import numpy as _np
            group = []
            expect = None
            for b in it:
                lead = jax.tree_util.tree_leaves(b)[0].shape[0]
                if expect is None:
                    expect = lead
                if lead != expect:
                    # ragged tail from a drop_last=False loader: np.stack would
                    # raise mid-epoch; skip it explicitly instead (scan stacks
                    # need uniform batch shapes)
                    print(f"prefetch_to_mesh: dropping ragged batch "
                          f"(leading dim {lead} != {expect})")
                    continue
                group.append(b)
                if len(group) == stack:
                    yield jax.tree_util.tree_map(
                        lambda *xs: _np.stack(xs), *group)
                    group = []
        iterator = grouped(iterator)

    buf = []
    for batch in iterator:
        buf.append(put(batch))
        if len(buf) > depth:
            yield buf.pop(0)
    yield from buf


def jit_scanned_train_step_sharded(train_step, k: int, mesh: Mesh,
                                   axis_name: str = "dp"):
    """Fuse k train steps into ONE dispatched program via lax.scan over a
    leading-axis stack of k batches. Amortizes the fixed per-dispatch host/RPC
    cost k-fold — the lever that matters on remote-transport backends where the
    single-step program is already device-bound (scripts/profile_step.py).
    Metrics come back stacked with leading dim k, in step order. The step folds
    its own on-device counter, so the constant key keeps full randomness."""
    def scanned(state, batches, key):
        def body(s, b):
            return train_step(s, b, key)
        return jax.lax.scan(body, state, batches)

    rep = replicated(mesh)
    bs = NamedSharding(mesh, P(None, axis_name))
    return jax.jit(scanned, in_shardings=(rep, bs, rep),
                   out_shardings=(rep, rep), donate_argnums=(0,))


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
