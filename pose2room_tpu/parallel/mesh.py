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


def make_mesh(devices=None, axis_name="data", model_parallel=1):
    """Device mesh: 1-D data-parallel by default; with ``model_parallel`` > 1
    a 2-D ('data', 'model') mesh for GSPMD tensor parallelism.

    Beyond-reference capability: the reference's only strategy is DDP
    (SURVEY §2.11).  Here the model axis shards large kernels' output dims
    (see ``shard_params``); XLA/GSPMD inserts the all-gathers/reduce-scatters
    over ICI — no explicit collective code.
    """
    if devices is None:
        devices = jax.devices()
    if model_parallel <= 1:
        return Mesh(np.asarray(devices), (axis_name,))
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (axis_name, "model"))


def shard_params(tree, mesh, min_size=1 << 14, model_axis="model"):
    """Tensor-parallel parameter placement over the mesh's model axis.

    Large (>= min_size elements) kernels whose output dim divides the model
    axis are sharded on that dim; everything else (biases, small kernels, BN
    state) is replicated.  GSPMD propagates the layouts through the jitted
    step and inserts the matching collectives, so this single placement
    function IS the tensor-parallel implementation.
    """
    if model_axis not in mesh.axis_names:
        return replicate(tree, mesh)
    tp = mesh.shape[model_axis]

    def placement(x):
        if (
            hasattr(x, "ndim")
            and x.ndim >= 2
            and x.shape[-1] % tp == 0
            and x.size >= min_size
        ):
            return NamedSharding(
                mesh, P(*([None] * (x.ndim - 1)), model_axis)
            )
        return replicated_sharding(mesh)

    return jax.tree.map(lambda x: jax.device_put(x, placement(x)), tree)


def batch_sharding(mesh, axis_name="data"):
    """Sharding for batch-leading arrays: dim 0 split over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh, axis_name="data"):
    """Place a host batch dict on the mesh with the batch axis sharded.

    Non-array entries (e.g. sample_idx strings) are passed through.
    Single-host batches whose leading dim is not divisible by the mesh size
    (e.g. a trailing partial batch) are replicated instead — correct, just
    without the data-parallel speedup for that one step.

    Multi-host: each process holds only its data shard (data/loader.py), so
    the global array is assembled from per-process local data — the leading
    dim of the result is local_batch × process_count.  This is the jax
    analogue of DDP's "each rank feeds its own DistributedSampler shard"
    (reference models/p2rnet/dataloader.py:179-180).  A batched array whose
    global leading dim does NOT divide the data axis is an ERROR here: the
    single-host replication fallback cannot apply, because each host holds
    DIFFERENT samples and ``multihost_replicate`` requires host-identical
    values — silently "replicating" would build a global array whose device
    shards disagree across hosts.  The loader prevents this by padding each
    host's shard to full equal-size batches (DistributedSampler behavior);
    the raise catches callers that bypass it.
    """
    n_shard = mesh.shape[axis_name]  # split count = data-axis size only
    sharded = batch_sharding(mesh, axis_name)
    replicated = replicated_sharding(mesh)
    multihost = jax.process_count() > 1

    def put(k, x):
        if not isinstance(x, np.ndarray):
            return x
        if multihost:
            if x.shape and (x.shape[0] * jax.process_count()) % n_shard == 0:
                return jax.make_array_from_process_local_data(sharded, x)
            if x.shape:
                raise ValueError(
                    f"shard_batch: multi-host batch array {k!r} has local "
                    f"leading dim {x.shape[0]} (global "
                    f"{x.shape[0] * jax.process_count()}) not divisible by "
                    f"the {n_shard}-way data axis; per-host data differs so "
                    "it cannot be replicated. Use equal, divisible per-host "
                    "batches (DataLoader pads shards in multi-host mode)."
                )
            return multihost_replicate(x, mesh)  # 0-d: host-identical only
        s = sharded if x.shape and x.shape[0] % n_shard == 0 else replicated
        return jax.device_put(x, s)

    return {k: put(k, v) for k, v in batch.items()}


def multihost_replicate(x, mesh):
    """Replicate one host-local array across a multi-host mesh (all hosts
    must pass the same value)."""
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(
        x, mesh, jax.sharding.PartitionSpec()
    )


def replicate(tree, mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.device_put(tree, sharding)
