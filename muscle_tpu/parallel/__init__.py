from muscle_tpu.parallel.mesh import (
    make_mesh,
    make_data_mesh_for_batch,
    data_sharding,
    spatial_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    local_batch_slice,
)
