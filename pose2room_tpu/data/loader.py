"""Host-side batched data loader with prefetch and per-host sharding.

TPU-native replacement for the reference's torch DataLoader stack
(models/p2rnet/dataloader.py:173-197): instead of worker processes + a
DistributedSampler, samples are read by a thread pool (HDF5 reads release the
GIL), collated into fixed-shape numpy batches, and — in multi-host runs —
each host reads only its ``process_index``-th shard of the epoch permutation
(the jax analogue of DistributedSampler).  Per-epoch reshuffling matches
``sampler.set_epoch`` semantics via seed = base_seed + epoch.
"""

from concurrent.futures import ThreadPoolExecutor

import numpy as np


def collate(samples):
    """Stack a list of sample dicts; string keys become lists."""
    batch = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], str):
            batch[key] = vals
        else:
            batch[key] = np.stack(vals)
    return batch


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size,
        shuffle=False,
        seed=42,
        drop_last=False,
        num_workers=8,
        process_index=0,
        process_count=1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.process_index = process_index
        self.process_count = process_count
        self.epoch = 0
        self._pool = ThreadPoolExecutor(max_workers=num_workers) if num_workers else None
        # dedicated single-thread prefetcher: reads batch k+1 while batch k
        # trains (must be distinct from _pool — its task blocks on _pool.map)
        self._prefetcher = ThreadPoolExecutor(max_workers=1) if num_workers else None

    def set_epoch(self, epoch):
        self.epoch = epoch

    def _epoch_indices(self):
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        if self.process_count > 1:
            # Multi-host: pad the permutation by wrap-around so every host's
            # shard has the same length AND every batch is full-size —
            # reference DistributedSampler behavior (duplicates a few samples
            # per epoch).  Required for correctness, not just speed: hosts
            # must dispatch the same number of identically-shaped global
            # batches (shard_batch builds each global array from per-process
            # local shards and rejects uneven ones).
            stride = self.process_count * self.batch_size
            total = -(-n // stride) * stride  # ceil to a multiple
            if total > n:
                order = np.resize(order, total)  # cyclic repeat
        # per-host shard (DistributedSampler analogue): host i takes every
        # process_count-th sample starting at i — same coverage, no overlap.
        return order[self.process_index :: self.process_count]

    def __len__(self):
        n = len(self._epoch_indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        order = self._epoch_indices()
        rng = np.random.RandomState(self.seed * 7919 + self.epoch)

        def fetch(i):
            return self.dataset.__getitem__(int(i), rng=np.random.RandomState(rng_seeds[i_pos[int(i)]]))

        # pre-draw per-sample augmentation seeds so thread scheduling cannot
        # change results (determinism parity with worker_init reseeding)
        rng_seeds = rng.randint(0, 2 ** 31 - 1, size=len(order))
        i_pos = {int(idx): pos for pos, idx in enumerate(order)}

        def make_batch(start):
            chunk = order[start : start + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return None
            if self._pool is not None:
                samples = list(self._pool.map(fetch, chunk))
            else:
                samples = [fetch(i) for i in chunk]
            return collate(samples)

        starts = list(range(0, len(order), self.batch_size))
        if self._pool is None:
            for start in starts:
                batch = make_batch(start)
                if batch is not None:
                    yield batch
            return

        # pipeline: read batch k+1 while batch k is on the device
        pending = self._prefetcher.submit(make_batch, starts[0]) if starts else None
        for next_start in starts[1:] + [None]:
            batch = pending.result()
            pending = (
                self._prefetcher.submit(make_batch, next_start)
                if next_start is not None
                else None
            )
            if batch is not None:
                yield batch
