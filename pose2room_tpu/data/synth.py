"""Synthetic VirtualHome-format sample generation.

The reference's data-synthesis pipeline (SURVEY.md §2.9) drives a Unity
simulator to record skeletons, then post-processes recordings into HDF5
samples (utils/virtualhome/3_generate_samples.py) and split JSONs
(4_split_samples.py).  The Unity binary is not distributable, so this module
provides the post-Unity half as a capability: given (or generating) skeleton
trajectories and object layouts, it writes HDF5 samples with the exact
reference schema and computes per-joint GT votes with the same rule —
joints inside an object's bbox inflated by contact_dist_thresh=1.0
contribute up to GT_VOTE_FACTOR=3 centroid-offset votes plus a mask
(3_generate_samples.py:56-79).

Used by the test suite and benchmarks as a stand-in dataset; also usable to
re-process real VirtualHome recordings (see ``votes_for_skeleton``).
"""

import json
import os

import numpy as np

from pose2room_tpu.ops.boxes import head2rot, points_in_obb

GT_VOTE_FACTOR = 3


def votes_for_skeleton(joints, instances, contact_dist=1.0):
    """Compute (F, V, 1+3*GT_VOTE_FACTOR) per-joint GT votes.

    For each object (in order), joints inside its inflated bbox get a vote
    slot (up to 3 per joint) holding the centroid offset; slot 0 is the mask.
    Mirrors 3_generate_samples.py:get_votes semantics.
    """
    F, V, _ = joints.shape
    votes = np.zeros((F, V, 1 + 3 * GT_VOTE_FACTOR), dtype=np.float64)
    counts = np.zeros((F, V), dtype=np.int64)
    flat = joints.reshape(F * V, 3)
    for inst in instances:
        heading = np.arctan2(-inst["R_mat"][0, 2], inst["R_mat"][0, 0])
        inside = points_in_obb(
            flat, inst["centroid"], inst["size"], heading, margin=contact_dist, xp=np
        ).reshape(F, V)
        offset = inst["centroid"][None, None] - joints  # (F,V,3)
        for k in range(GT_VOTE_FACTOR):
            slot = inside & (counts == k)
            sl = slice(1 + 3 * k, 4 + 3 * k)
            votes[..., sl][slot] = offset[slot]
            # first vote fills the remaining empty slots too (reference
            # pads unused slots with the first vote)
            if k == 0:
                for k2 in range(1, GT_VOTE_FACTOR):
                    sl2 = slice(1 + 3 * k2, 4 + 3 * k2)
                    votes[..., sl2][slot] = offset[slot]
        votes[..., 0][inside] = 1
        counts[inside] += 1
    return votes


def make_scene(rng, n_objects=4, n_frames=300, num_classes=22, n_joints=53,
               class_buckets=None):
    """Generate a random room: objects + a wandering skeleton trajectory.

    The class id is a deterministic function of the box geometry (volume
    bucket) so the semantic head has signal to learn from — unlike a random
    label, which no pose-only model could ever predict.  ``class_buckets``
    controls how many distinct class ids are used (fewer buckets = an easier,
    more diagnostic classification task).
    """
    buckets = class_buckets or num_classes
    instances = []
    for _ in range(n_objects):
        heading = rng.uniform(-np.pi, np.pi)
        size = rng.uniform(0.3, 1.5, size=3)
        vol = float(np.prod(size))  # in (0.027, 3.375)
        cls = int(
            np.clip(np.floor(np.log(vol / 0.027) / np.log(3.375 / 0.027) * buckets),
                    0, buckets - 1)
        )
        instances.append(
            {
                "class_id": cls,
                "centroid": np.array(
                    [rng.uniform(-3, 3), rng.uniform(0.2, 1.0), rng.uniform(-3, 3)]
                ),
                "R_mat": head2rot(heading, xp=np),
                "size": size,
            }
        )

    # hip trajectory: smooth random walk visiting object neighbourhoods
    waypoints = np.stack([i["centroid"] for i in instances])
    t = np.linspace(0, len(waypoints) - 1, n_frames)
    base = np.stack(
        [np.interp(t, np.arange(len(waypoints)), waypoints[:, d]) for d in range(3)],
        axis=1,
    )
    base[:, 1] = 0.9  # hip height
    base += rng.randn(n_frames, 3) * 0.05

    # joints: hip + limbs as offsets
    offsets = rng.randn(1, n_joints, 3) * 0.25
    offsets[0, 0] = 0
    joints = base[:, None, :] + offsets + rng.randn(n_frames, n_joints, 3) * 0.02
    return joints, instances


def write_sample(path, joints, instances, contact_dist=1.0):
    """Write one reference-schema HDF5 sample."""
    import h5py

    votes = votes_for_skeleton(joints, instances, contact_dist)
    with h5py.File(path, "w") as f:
        f.create_dataset("skeleton_joints", data=joints.astype(np.float32))
        f.create_dataset("skeleton_joint_votes", data=votes.astype(np.float32))
        nodes = f.create_group("object_nodes")
        for i, inst in enumerate(instances):
            g = nodes.create_group(str(i))
            g.create_dataset("class_id", data=np.array([inst["class_id"]], dtype=np.int64))
            g.create_dataset("centroid", data=inst["centroid"].astype(np.float32))
            g.create_dataset("R_mat", data=inst["R_mat"].astype(np.float32))
            g.create_dataset("size", data=inst["size"].astype(np.float32))


def write_synthetic_dataset(root, n_train=8, n_test=4, seed=0, n_frames=300,
                            class_buckets=None):
    """Create a tiny reference-format dataset: samples/ + splits/ JSONs.

    Returns (train_split_path, test_split_path).
    """
    rng = np.random.RandomState(seed)
    sample_dir = os.path.join(root, "samples")
    split_dir = os.path.join(root, "splits", "script_level")
    os.makedirs(sample_dir, exist_ok=True)
    os.makedirs(split_dir, exist_ok=True)

    paths = []
    for i in range(n_train + n_test):
        p = os.path.join(sample_dir, f"sample_{i:04d}.hdf5")
        joints, instances = make_scene(
            rng, n_objects=int(rng.randint(2, 6)), n_frames=n_frames,
            class_buckets=class_buckets,
        )
        write_sample(p, joints, instances)
        paths.append(p)

    train_split = os.path.join(split_dir, "train.json")
    test_split = os.path.join(split_dir, "test.json")
    with open(train_split, "w") as f:
        json.dump(paths[:n_train], f)
    with open(test_split, "w") as f:
        json.dump(paths[n_train:], f)
    # val == test, as in the reference split generator (4_split_samples.py:74-76)
    with open(os.path.join(split_dir, "val.json"), "w") as f:
        json.dump(paths[n_train:], f)
    return train_split, test_split
