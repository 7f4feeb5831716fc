"""Data pipeline tests: synth HDF5 round-trip, augmentation invariants, loader."""

import numpy as np
import pytest

from pose2room_tpu.data import (
    P2RNetDataset,
    DataLoader,
    write_synthetic_dataset,
    augment_sample,
)
from pose2room_tpu.data.synth import make_scene, votes_for_skeleton
from pose2room_tpu.ops.boxes import rot2head


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("vh")
    train, test = write_synthetic_dataset(str(root), n_train=6, n_test=3, n_frames=120)
    return str(root), train, test


def test_sample_format(dataset_root):
    _, train, _ = dataset_root
    ds = P2RNetDataset(train, num_frames=64, augment=False)
    assert len(ds) == 6
    s = ds[0]
    assert s["input_joints"].shape == (64, 53, 3)
    assert s["input_joints"].dtype == np.float32
    assert s["box_label_mask"].shape == (10,)
    assert s["center_label"].shape == (10, 3)
    assert s["size"].shape == (10, 3)
    assert s["heading"].shape == (10, 2)
    assert s["vote_label"].shape == (64, 53, 9)
    assert s["vote_label_mask"].shape == (64, 53)
    assert s["sem_cls_label"].dtype == np.int64
    # heading is unit (sin, cos) for valid boxes
    m = s["box_label_mask"] > 0
    np.testing.assert_allclose(
        np.linalg.norm(s["heading"][m], axis=1), 1.0, atol=1e-5
    )


def test_votes_point_at_centroids(dataset_root):
    rng = np.random.RandomState(3)
    joints, instances = make_scene(rng, n_objects=2, n_frames=50)
    votes = votes_for_skeleton(joints, instances)
    mask = votes[..., 0] > 0
    assert mask.any()
    # first-slot votes land on some object centroid
    targets = joints[mask] + votes[mask][:, 1:4]
    cents = np.stack([i["centroid"] for i in instances])
    d = np.linalg.norm(targets[:, None, :] - cents[None], axis=2).min(1)
    np.testing.assert_allclose(d, 0, atol=1e-9)


def test_augmentation_consistency(dataset_root):
    """Votes must keep pointing at (augmented) object centroids after augment."""
    rng = np.random.RandomState(0)
    joints, instances = make_scene(rng, n_objects=3, n_frames=40)
    votes = votes_for_skeleton(joints, instances)
    for trial in range(5):
        j2, inst2, v2 = augment_sample(
            joints.copy(),
            [dict(i) for i in instances],
            votes.copy(),
            np.random.RandomState(trial),
        )
        mask = v2[..., 0] > 0
        targets = j2[mask] + v2[mask][:, 1:4]
        cents = np.stack([i["centroid"] for i in inst2])
        d = np.linalg.norm(targets[:, None, :] - cents[None], axis=2).min(1)
        np.testing.assert_allclose(d, 0, atol=1e-6)
        # R_mat stays a rotation
        for i in inst2:
            np.testing.assert_allclose(
                i["R_mat"] @ i["R_mat"].T, np.eye(3), atol=1e-6
            )


def test_loader_batching(dataset_root):
    _, train, _ = dataset_root
    ds = P2RNetDataset(train, num_frames=64, augment=True)
    dl = DataLoader(ds, batch_size=4, shuffle=True, seed=1, num_workers=2)
    batches = list(dl)
    assert len(batches) == 2  # 6 samples -> 4 + 2
    assert batches[0]["input_joints"].shape == (4, 64, 53, 3)
    assert batches[1]["input_joints"].shape == (2, 64, 53, 3)
    assert isinstance(batches[0]["sample_idx"][0], str)

    # same epoch -> identical order+augmentation; next epoch differs
    again = list(dl)
    np.testing.assert_array_equal(
        batches[0]["input_joints"], again[0]["input_joints"]
    )
    dl.set_epoch(1)
    shuffled = list(dl)
    assert not np.array_equal(batches[0]["input_joints"], shuffled[0]["input_joints"])


def test_loader_process_mode_matches_thread(dataset_root):
    """worker_mode='process' (the reference's worker-process DataLoader
    analogue, dataloader.py:173-197) must be batch-for-batch identical to
    thread mode: augmentation seeds are pre-drawn from the epoch RNG, so
    results cannot depend on worker kind or count."""
    _, train, _ = dataset_root
    ds = P2RNetDataset(train, num_frames=64, augment=True)
    dl_t = DataLoader(ds, batch_size=4, shuffle=True, seed=1, num_workers=2)
    dl_p = DataLoader(
        ds, batch_size=4, shuffle=True, seed=1, num_workers=2,
        worker_mode="process",
    )
    for epoch in range(2):
        dl_t.set_epoch(epoch)
        dl_p.set_epoch(epoch)
        for bt, bp in zip(list(dl_t), list(dl_p)):
            assert bt.keys() == bp.keys()
            for k in bt:
                if isinstance(bt[k], list):
                    assert bt[k] == bp[k]
                else:
                    np.testing.assert_array_equal(bt[k], bp[k], err_msg=k)

    with pytest.raises(ValueError):
        DataLoader(ds, batch_size=4, num_workers=2, worker_mode="fiber")


def test_loader_host_sharding(dataset_root):
    """Multi-host shards cover every sample, and — DistributedSampler
    parity — are wrap-padded so each host yields the SAME number of
    FULL-SIZE batches (shard_batch requires equal divisible per-host
    batches; duplicates come from the cyclic pad only)."""
    _, train, _ = dataset_root
    ds = P2RNetDataset(train, num_frames=64, augment=False)
    seen = []
    per_host = []
    for pi in range(2):
        dl = DataLoader(
            ds, batch_size=2, shuffle=False, process_index=pi, process_count=2,
            num_workers=0,
        )
        host_samples = []
        for b in dl:
            assert len(b["sample_idx"]) == 2  # every batch full-size
            host_samples.extend(b["sample_idx"])
        per_host.append(host_samples)
        seen.extend(host_samples)
    all_ids = sorted(s["sample_idx"] for s in (ds[i] for i in range(len(ds))))
    assert sorted(set(seen)) == all_ids  # full coverage
    assert len(per_host[0]) == len(per_host[1])  # equal shard lengths
    # n=6, stride=4 -> padded to 8: exactly 2 wrap-around duplicates
    assert len(seen) == 8


def test_instance_cache_hit_and_invalidation(tmp_path):
    """The per-file instance-metadata cache returns equal-but-independent
    copies (augmentation mutates nodes in place) and invalidates when the
    file is rewritten (mtime key)."""
    import os
    import time

    from pose2room_tpu.data.dataset import load_sample
    from pose2room_tpu.data.synth import make_scene, write_sample

    rng = np.random.RandomState(0)
    path = str(tmp_path / "s.hdf5")
    joints, instances = make_scene(rng, n_objects=3, n_frames=50)
    write_sample(path, joints, instances)

    cache = {}
    _, _, inst1 = load_sample(path, dtype=np.float32, instance_cache=cache)
    assert len(cache) == 1
    _, _, inst2 = load_sample(path, dtype=np.float32, instance_cache=cache)
    assert len(cache) == 1  # hit, not a second entry
    for a, b in zip(inst1, inst2):
        np.testing.assert_array_equal(a["centroid"], b["centroid"])
        assert a["centroid"] is not b["centroid"]  # independent copies
    # in-place mutation (what augment_sample does) must not leak back
    inst2[0]["centroid"] += 100.0
    _, _, inst3 = load_sample(path, dtype=np.float32, instance_cache=cache)
    np.testing.assert_array_equal(inst3[0]["centroid"], inst1[0]["centroid"])

    # rewrite the file -> mtime mismatch -> fresh read that REPLACES the
    # stale entry (path-keyed; a (path, mtime) key would grow unboundedly
    # across rewrites in a long-lived process)
    time.sleep(0.01)
    joints2, instances2 = make_scene(rng, n_objects=2, n_frames=50)
    write_sample(path, joints2, instances2)
    _, _, inst4 = load_sample(path, dtype=np.float32, instance_cache=cache)
    assert len(inst4) == 2
    assert len(cache) == 1  # superseded entry evicted, not accumulated
