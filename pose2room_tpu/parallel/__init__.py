from pose2room_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    shard_params,
    replicate,
    batch_sharding,
    replicated_sharding,
)
from pose2room_tpu.parallel.collectives import allgather_object
