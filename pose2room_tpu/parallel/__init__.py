from pose2room_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    batch_sharding,
    replicated_sharding,
)
from pose2room_tpu.parallel.collectives import allgather_object
