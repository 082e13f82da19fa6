from .mesh import (
    make_mesh, shard_batch, replicate, set_default_devices,
    default_devices, device_count,
    sharded_train_step, sharded_propagate, distributed_iso_step,
)
