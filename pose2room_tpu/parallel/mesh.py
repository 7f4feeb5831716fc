"""Device mesh + sharding helpers: the distribution layer.

TPU-native replacement for the reference's DDP machinery
(net_utils/utils.py:408-514 + torch.distributed.launch): a single code path
where the model is replicated and the batch is sharded over a ``('data',)``
mesh via ``jax.sharding.NamedSharding``.  Gradient/metric all-reduces are
inserted by XLA (riding ICI) because the loss is a mean over the sharded
batch axis — there is no explicit collective code to maintain.  Scaling from
1 chip to a slice is a mesh-size change, mirroring how the 4-GPU recipe in
scripts/train.sh maps onto a v5e slice with zero code difference.

Multi-host: call ``jax.distributed.initialize()`` before anything else (the
``initiate_environment`` hook does this when JAX coordinator env vars are
present); per-host data sharding lives in data/loader.py.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name="data"):
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh, axis_name="data"):
    """Sharding for batch-leading arrays: dim 0 split over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh, axis_name="data"):
    """device_put a host batch dict with the batch axis sharded.

    Non-array entries (e.g. sample_idx strings) are passed through.  Batches
    whose leading dim is not divisible by the mesh size (e.g. a trailing
    partial batch) are replicated instead — correct, just without the
    data-parallel speedup for that one step.
    """
    n_dev = mesh.devices.size
    sharded = batch_sharding(mesh, axis_name)
    replicated = replicated_sharding(mesh)

    def put(x):
        if isinstance(x, np.ndarray):
            s = sharded if x.shape and x.shape[0] % n_dev == 0 else replicated
            return jax.device_put(x, s)
        return x

    return {k: put(v) for k, v in batch.items()}


def replicate(tree, mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.device_put(tree, sharding)
