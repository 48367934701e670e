from muscle_tpu.parallel.mesh import (
    make_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    local_batch_slice,
)
