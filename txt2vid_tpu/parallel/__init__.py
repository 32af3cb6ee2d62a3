from txt2vid_tpu.parallel.mesh import (
    make_mesh, batch_sharding, replicated, shard_batch, shard_train_state,
    state_sharding)

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch",
           "shard_train_state", "state_sharding"]
