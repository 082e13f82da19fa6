from .mesh import (
    make_mesh, shard_batch, replicate,
    sharded_train_step, sharded_propagate, distributed_iso_step,
)
