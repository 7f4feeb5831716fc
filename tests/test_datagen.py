"""Data-synthesis pipeline tests (stage 3-4): processing, augmentation, splits."""

import glob
import json
import os

import numpy as np
import pytest

from pose2room_tpu.datagen import (
    process_recording,
    generate_splits,
    compute_avg_prior,
)
from pose2room_tpu.datagen.samples import (
    augment_8,
    compute_votes,
    check_in_box,
    class_mapping,
    read_pd_script,
)
from pose2room_tpu.ops.boxes import head2rot


def _scene(rng):
    room_bbox = {
        "centroid": np.array([1.0, 1.5, -2.0]),
        "size": np.array([8.0, 3.0, 8.0]),
        "R_mat": np.eye(3),
    }
    nodes = []
    for raw in ("sofa", "bed", "tv"):
        h = rng.rand() * 2 - 1
        nodes.append(
            {
                "class_name": raw,
                "centroid": room_bbox["centroid"] + rng.randn(3) * 1.0,
                "size": rng.rand(3) + 0.4,
                "R_mat": head2rot(h, xp=np),
            }
        )
    F, V = 60, 53
    joints = rng.randn(F, V, 3) * 0.2 + room_bbox["centroid"]
    joints[:, :, 0] += np.linspace(-2, 2, F)[:, None]
    return room_bbox, nodes, joints


def test_process_recording_roundtrip(tmp_path, rng):
    room_bbox, nodes, joints = _scene(rng)
    base = str(tmp_path / "s1_r1_sc1_char")
    files = process_recording(joints, room_bbox, nodes, base, augment=True)
    assert len(files) == 8
    import h5py

    from pose2room_tpu.data import P2RNetDataset

    with h5py.File(files[0], "r") as f:
        j = f["skeleton_joints"][:]
        v = f["skeleton_joint_votes"][:]
        assert j.shape[1:] == (53, 3)
        assert v.shape[-1] == 10
        # recentered: room floor centroid at origin
        assert (v[..., 0] > 0).any()
        # class mapping applied
        cls = int(np.asarray(f["object_nodes"]["0"]["class_id"]).reshape(-1)[0])
        assert 0 <= cls < 22

    # samples are loadable by the training dataset
    split = tmp_path / "train.json"
    with open(split, "w") as f:
        json.dump(files, f)
    ds = P2RNetDataset(str(split), num_frames=32)
    sample = ds[0]
    assert sample["input_joints"].shape == (32, 53, 3)


def test_augment_8_preserves_geometry(rng):
    room_bbox, nodes, joints = _scene(rng)
    for aug_idx in range(8):
        rb, nds, jts = augment_8(room_bbox, nodes, joints, aug_idx)
        # rotations preserve containment relations
        votes0 = compute_votes(nodes, joints)
        votes1 = compute_votes(nds, jts)
        np.testing.assert_array_equal(votes0[..., 0], votes1[..., 0])
        for n in nds:
            np.testing.assert_allclose(n["R_mat"] @ n["R_mat"].T, np.eye(3), atol=1e-9)


def test_vote_first_slot_padding(rng):
    room_bbox, nodes, joints = _scene(rng)
    votes = compute_votes(nodes[:1], joints)
    mask = votes[..., 0] > 0
    # single object: all three slots hold the same (first) vote
    np.testing.assert_allclose(votes[mask][:, 1:4], votes[mask][:, 4:7])
    np.testing.assert_allclose(votes[mask][:, 1:4], votes[mask][:, 7:10])


def test_rejects_out_of_room(tmp_path, rng):
    room_bbox, nodes, joints = _scene(rng)
    far = joints + 100.0
    files = process_recording(far, room_bbox, nodes, str(tmp_path / "bad"))
    assert files == []


def test_class_mapping():
    ids, names = class_mapping(["tablelamp", "tv", "kitchencabinet"])
    assert names == ["lamp", "monitor", "cabinet"]


def test_read_pd_script(tmp_path):
    F, J = 4, 56
    rng = np.random.RandomState(0)
    data = rng.randn(F, J, 3)
    path = tmp_path / "pd_script.txt"
    with open(path, "w") as f:
        for i in range(F):
            f.write(f"{i} " + " ".join(f"{x:.6f}" for x in data[i].ravel()) + "\n")
    joints = read_pd_script(str(path))
    assert joints.shape == (F, 53, 3)
    valid = [i for i in range(56) if i not in (23, 54, 55)]
    np.testing.assert_allclose(joints, data[:, valid], atol=1e-6)


def test_splits_and_prior(tmp_path, rng):
    room_bbox, nodes, joints = _scene(rng)
    files = []
    for scene in range(3):
        for room in range(2):
            base = str(tmp_path / f"s{scene}_r{room}_sc0_charA")
            files += process_recording(joints, room_bbox, nodes, base, augment=False)
    assert len(files) == 6

    split = generate_splits(files, str(tmp_path / "splits" / "script_level"), seed=2)
    assert len(split["train"]) + len(split["val"]) == 6
    assert split["val"] == split["test"]
    for name in ("train", "val", "test"):
        assert os.path.isfile(tmp_path / "splits" / "script_level" / f"{name}.json")

    room_split = generate_splits(
        files, str(tmp_path / "splits" / "room_level"), level="room_level", seed=2
    )
    # room-level: train and test marks are disjoint
    def marks(paths):
        return {"_".join(os.path.basename(p).split("_")[:2]) for p in paths}

    assert not (marks(room_split["train"]) & marks(room_split["test"]))

    prior = compute_avg_prior(files, str(tmp_path / "splits" / "script_level"))
    assert os.path.isfile(tmp_path / "splits" / "script_level" / "avg_data.json")
    assert len(prior["obj_size_cls_avg"]) >= 1
    assert "layout_size_avg" in prior
