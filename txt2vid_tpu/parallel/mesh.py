"""Device mesh + sharding layer (the TPU-native replacement for the reference's
torch.nn.parallel.data_parallel scatter/gather, SURVEY.md §2.8).

Design: one `jax.sharding.Mesh` over all chips with a `dp` (data) axis; batches are
sharded over `dp`, parameters and optimizer state are replicated, and XLA inserts the
gradient all-reduce over ICI automatically when the jitted train step consumes sharded
batches with replicated-out params. An optional `sp` axis ring-shards non-local
attention tokens (ops/ring_attention.py). An optional `fsdp` axis shards parameters,
optimizer moments, and BN stats across devices (ZeRO-3 / weight-sharded data
parallelism): each leaf above a size threshold is split along its largest divisible
dim, GSPMD all-gathers weights at use and reduce-scatters their gradients, and the
3x-params Adam state never materializes fully on any one chip — the memory lever for
scaling past a single chip's HBM. Classic channel-sharded tensor parallelism,
pipeline, and expert axes are deliberately NOT offered: at this family's scale
(~1e8 params, conv-dominated) fsdp strictly dominates TP (same weight traffic, no
activation collectives inside every conv), nothing needs pipelining (whole model
fits), and there are no experts.

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
              sp: int = 1, fsdp: int = 1) -> Mesh:
    """dp mesh, optionally extended with an `sp` axis (sequence-parallel: feeds
    ops.attention.sequence_parallel / ring attention for long-clip configs) and an
    `fsdp` axis (parameter/optimizer-state sharding, see module docstring)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % (sp * fsdp) == 0, \
        f"{n} devices not divisible by sp={sp} * fsdp={fsdp}"
    shape, names = [n // (sp * fsdp)], [axis_name]
    if sp > 1:
        shape.append(sp)
        names.append("sp")
    if fsdp > 1:
        shape.append(fsdp)
        names.append("fsdp")
    return Mesh(np.array(devices).reshape(shape), tuple(names))


def batch_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _put(x, sharding):
    """device_put that also works in multi-controller (multi-host) runs.

    Single-process: plain device_put. Multi-process: every process holds the
    SAME host value (replicated leaves, restored checkpoints, full batches in
    tests) and contributes only its addressable shards via
    make_array_from_callback — device_put cannot target non-addressable
    devices. Process-LOCAL batch shards go through
    make_array_from_process_local_data in prefetch_to_mesh instead."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def put_replicated_key(key, mesh: Mesh):
    """Place a typed PRNG key replicated onto the (possibly multi-host) mesh."""
    rep = replicated(mesh)
    if jax.process_count() == 1:
        return jax.device_put(key, rep)
    kd = _put(jax.random.key_data(key), rep)
    return jax.random.wrap_key_data(kd, impl=jax.random.key_impl(key))


def shard_batch(batch, mesh: Mesh, axis_name: str = "dp"):
    """Place a host batch dict onto the mesh, sharded over the batch dim.
    In multi-host runs the batch passed here must be the GLOBAL batch
    (identical on every process); per-process local batches go through
    prefetch_to_mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: _put(x, sh), batch)


def _fsdp_spec(shape, fsdp_size: int, min_shard_elems: int = 1024) -> P:
    """Shape-based fsdp partition rule: split the largest divisible dim over the
    fsdp axis, replicate anything small or indivisible. Shape-based (not
    path-based) so a param leaf and its Adam mu/nu moments — identical shapes —
    always land on identical specs."""
    size = int(np.prod(shape)) if shape else 1
    if len(shape) == 0 or size < min_shard_elems * fsdp_size:
        return P()
    for i in sorted(range(len(shape)), key=lambda i: shape[i], reverse=True):
        if shape[i] % fsdp_size == 0:
            spec = [None] * len(shape)
            spec[i] = "fsdp"
            return P(*spec)
    return P()


def state_sharding(state, mesh: Mesh):
    """Per-leaf NamedSharding pytree for a train state: fsdp-sharded when the mesh
    has an fsdp axis (params, optimizer moments, and BN stats all follow the same
    shape-based rule), fully replicated otherwise. Pass the result both to
    device_put (shard_train_state does) and to jit in/out_shardings
    (jit_train_step_sharded's state_shardings)."""
    fsdp_size = mesh.shape.get("fsdp", 1)
    if fsdp_size <= 1:
        rep = replicated(mesh)
        return jax.tree_util.tree_map(lambda x: rep, state)
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(
            mesh, _fsdp_spec(tuple(getattr(x, "shape", ())), fsdp_size)), state)


def shard_train_state(state, mesh: Mesh):
    """Place a train state onto the mesh: replicated, or fsdp-sharded when the
    mesh has an fsdp axis. Works in multi-host runs too (every process holds
    the same host state, e.g. after a per-process checkpoint restore)."""
    return jax.tree_util.tree_map(
        lambda x, s: _put(x, s), state, state_sharding(state, mesh))


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
    a drop-last batch.

    Multi-host: each process feeds its LOCAL slice of the global batch (global
    batch = per-process batch x process count, concatenated over the data
    axis); make_array_from_process_local_data assembles the global arrays from
    the per-process shards without any cross-host copy (SURVEY.md §2.8 DCN row
    — the data never rides the interconnect, only gradients do)."""
    if stack > 1:
        sh = NamedSharding(mesh, P(None, axis_name))
    else:
        sh = batch_sharding(mesh, axis_name)

    if jax.process_count() > 1:
        import numpy as _np

        def put(batch):
            return jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    sh, _np.asarray(x)), batch)
    else:
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


_GATHER_PARAMS = []  # trace-time stack of replicated NamedShardings


import contextlib


@contextlib.contextmanager
def gather_params_at_use(mesh: Mesh):
    """Trace-time context (the sequence_parallel pattern): while active, the
    train step constrains every param tree to REPLICATED at its use sites via
    maybe_gather_params — including the post-optimizer updated D params the G
    phase backpropagates through, which a state-boundary constraint cannot
    reach (the r3 involuntary-remat warnings all sat on rev(add(W, update))
    in transpose(jvp(MultiScaleDiscrim)))."""
    _GATHER_PARAMS.append(NamedSharding(mesh, P()))
    try:
        yield
    finally:
        _GATHER_PARAMS.pop()


def maybe_gather_params(tree):
    """Constrain a param tree replicated when gather_params_at_use is active;
    identity otherwise. Called from the train step at param-use sites."""
    if not _GATHER_PARAMS:
        return tree
    rep = _GATHER_PARAMS[-1]
    return jax.tree.map(
        lambda x: jax.lax.with_sharding_constraint(x, rep), tree)


def _fsdp_gather_step(train_step, state_shardings, mesh: Mesh):
    """Wrap a train step with the explicit ZeRO-3 schedule for fsdp meshes:
    model variables (params/BN stats) are constrained to REPLICATED at use —
    one all-gather per step — and the produced state is constrained back to its
    canonical fsdp sharding, so only the stored state (params + both optimizer
    moments at rest) is sharded.

    Why explicit: left to propagation alone, GSPMD picks per-use-site shardings
    for the same conv kernel in the discriminator backward — the dgrad consumes
    the weight through a spatial `rev`, and the sharding it infers there
    disagrees with the weight-grad side — and resolves the conflict with an
    "Involuntary full rematerialization" (replicate-then-repartition,
    spmd_partitioner.cc:652, XLA b/433785288): wasted ICI bandwidth and HBM in
    EVERY backward. Pinning the weights replicated at use makes both backward
    consumers see one sharding; verified warning-free on the dp2 x sp2 x fsdp2
    CPU mesh (tests/test_fsdp.py asserts no involuntary remat in the compiled
    HLO). The transient full gather is the standard ZeRO-3 weights-at-use
    working set (~0.5 GB at this family's 1e8-param scale)."""
    rep = NamedSharding(mesh, P())

    def gather(tree):
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, rep), tree)

    def wrapped(state, batch, key):
        state = state.replace(
            g_vars=gather(state.g_vars), d_vars=gather(state.d_vars),
            txt_vars=gather(state.txt_vars), m_vars=gather(state.m_vars))
        # trace-time: the step also pins its INTERMEDIATE param views (e.g.
        # the updated D the G phase backpropagates through) replicated
        with gather_params_at_use(mesh):
            new_state, metrics = train_step(state, batch, key)
        new_state = jax.tree.map(
            jax.lax.with_sharding_constraint, new_state, state_shardings)
        return new_state, metrics

    return wrapped


def jit_scanned_train_step_sharded(train_step, k: int, mesh: Mesh,
                                   axis_name: str = "dp", state_shardings=None):
    """Fuse k train steps into ONE dispatched program via lax.scan over a
    leading-axis stack of k batches. Amortizes the fixed per-dispatch host/RPC
    cost k-fold — the lever that matters on remote-transport backends where the
    single-step program is already device-bound (scripts/profile_step.py).
    Metrics come back stacked with leading dim k, in step order. The step folds
    its own on-device counter, so the constant key keeps full randomness."""
    if state_shardings is not None:
        train_step = _fsdp_gather_step(train_step, state_shardings, mesh)

    def scanned(state, batches, key):
        def body(s, b):
            return train_step(s, b, key)
        return jax.lax.scan(body, state, batches)

    rep = replicated(mesh)
    ss = rep if state_shardings is None else state_shardings
    bs = NamedSharding(mesh, P(None, axis_name))
    return jax.jit(scanned, in_shardings=(ss, bs, rep),
                   out_shardings=(ss, rep), donate_argnums=_donate())


def jit_train_step_sharded(train_step, mesh: Mesh, axis_name: str = "dp",
                           state_shardings=None):
    """jit the train step with explicit in/out shardings: state replicated (or the
    given per-leaf sharding pytree — state_sharding(state, mesh) — for fsdp
    meshes), batch dp-sharded, key replicated. XLA turns the loss/grad means into
    psum over ICI; with fsdp state shardings it inserts the weight all-gathers and
    gradient reduce-scatters (ZeRO-3 schedule) itself."""
    rep = replicated(mesh)
    ss = rep if state_shardings is None else state_shardings
    if state_shardings is not None:
        train_step = _fsdp_gather_step(train_step, state_shardings, mesh)
    bs = batch_sharding(mesh, axis_name)
    return jax.jit(
        train_step,
        in_shardings=(ss, bs, rep),
        out_shardings=(ss, rep),
        donate_argnums=_donate(),  # reuse the old state's buffers for the new state
    )


def _donate():
    """State-donation argnums for the train-step jits: donation is what keeps
    the two-copies-of-state memory profile, but under --debug_nans the NaN
    locator re-executes the step eagerly with the SAME input buffers — donated
    (deleted) buffers would make the replay raise instead of pinpointing the
    op. Keep the state alive when the debugger is on."""
    return () if jax.config.jax_debug_nans else (0,)


def jit_split_train_step_sharded(d_grad_step, clip_step, apply_step, mesh: Mesh,
                                 axis_name: str = "dp", state_shardings=None):
    """jit the three split-dispatch programs (train_step.build_split_train_step)
    and compose them into the trainer's (state, batch, key) -> (state, metrics)
    signature. The D grads stay on device between dispatches (replicated — the
    backward's XLA-inserted psum already reduced them over dp); only apply_step
    donates the state (d_grad_step must leave it alive for apply_step), and the
    grads are donated forward through the clip into the optimizer update.
    Requires replicated (non-fsdp) state: the carried grads pytree would need
    per-leaf shardings matching the fsdp param layout."""
    assert state_shardings is None, \
        "--clip_grad_split with fsdp state shardings is not supported"
    rep = replicated(mesh)
    bs = batch_sharding(mesh, axis_name)
    jit_grad = jax.jit(d_grad_step, in_shardings=(rep, bs, rep),
                       out_shardings=rep)
    jit_clip = jax.jit(clip_step, donate_argnums=(0,))
    jit_apply = jax.jit(apply_step, in_shardings=(rep, bs, rep, rep, rep, rep),
                        out_shardings=(rep, rep),
                        donate_argnums=_donate() + ((3,) if not
                                                    jax.config.jax_debug_nans
                                                    else ()))

    def run(state, batch, key):
        grads, loss_d = jit_grad(state, batch, key)
        grads, norm = jit_clip(grads)
        return jit_apply(state, batch, key, grads, norm, loss_d)

    return run
