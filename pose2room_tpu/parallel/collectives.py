"""Host-level collectives for multi-process metric aggregation.

TPU-native replacement for the reference's explicit NCCL metric all-reduce
(net_utils/utils.py:319-327 ``synchronize_between_processes`` and
:490-514 ``reduce_dict``).  Losses computed inside the sharded jit need no
collective (the mean over the global batch axis already rides ICI); what DOES
need one is host-side Python state — the APCalculator's per-scan prediction
lists and host-accumulated loss counters — which in a multi-host run exist
only for each host's data shard.

``allgather_object`` moves arbitrary picklable objects between processes by
riding ``jax.experimental.multihost_utils.process_allgather`` on a padded
uint8 payload (two collectives: sizes, then data).  Single-process runs take
a fast path with no jax involvement.
"""

import pickle

import numpy as np


def allgather_object(obj):
    """Gather one picklable object per process; returns a list of length
    ``jax.process_count()`` ordered by process index (every process gets the
    full list, mirroring torch.distributed.all_gather_object)."""
    import jax

    if jax.process_count() == 1:
        return [obj]

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    sizes = np.asarray(
        multihost_utils.process_allgather(np.array([payload.size], np.int64))
    ).reshape(-1)
    padded = np.zeros((int(sizes.max()),), np.uint8)
    padded[: payload.size] = payload
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    gathered = gathered.reshape(len(sizes), -1)
    return [
        pickle.loads(gathered[p, : int(sizes[p])].tobytes())
        for p in range(len(sizes))
    ]
