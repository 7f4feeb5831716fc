"""Stage-1/2 datagen tests: program synthesis from a recorded scene graph and
the robust skeleton-recording loop, driven end-to-end into stage 3/4 with a
fake simulator (the Unity binary is the only unported piece)."""

import glob
import json
import os
import time

import numpy as np
import pytest

from pose2room_tpu.config.dataset_config import CLASS_LABELS_RAW
from pose2room_tpu.datagen.programs import (
    balance_instance_probs,
    box_prop,
    correct_door_bbox,
    generate_room_programs,
    quat_rotation_matrix,
)
from pose2room_tpu.datagen.skeletons import render_recordings

IDENT = [1.0, 0.0, 0.0, 0.0]  # (w, x, y, z)


def _node(nid, cls, category, center, size, properties=(), states=(),
          rotation=IDENT):
    return {
        "id": nid,
        "class_name": cls,
        "category": category,
        "properties": list(properties),
        "states": list(states),
        "bounding_box": {"center": list(center), "size": list(size)},
        "obj_transform": {"rotation": list(rotation)},
    }


def scene_graph():
    """One 8x3x8 room (floor + 2 walls), a sofa/fridge/tv to detect, a
    grabbable apple, a door + doorjamb, and an out-of-room bench."""
    nodes = [
        _node(1, "livingroom", "Rooms", [0, 1.5, 0], [8, 3, 8]),
        _node(2, "floor", "Floors", [0, -0.05, 0], [8, 0.1, 8]),
        _node(3, "wall", "Walls", [-4, 1.5, 0], [0.1, 3, 8]),
        _node(4, "wall", "Walls", [4, 1.5, 0], [0.1, 3, 8]),
        _node(10, "sofa", "Furniture", [2, 0.4, 2], [2.0, 0.8, 0.9],
              properties=["SITTABLE"]),
        _node(11, "fridge", "Appliances", [-2, 1.0, 1], [0.9, 2.0, 0.9],
              properties=["CAN_OPEN", "CONTAINERS"], states=["CLOSED"]),
        _node(12, "tv", "Electronics", [3, 1.0, -3], [1.2, 0.7, 0.2],
              properties=["HAS_SWITCH"], states=["OFF"]),
        _node(20, "apple", "Props", [0.5, 0.9, -1], [0.1, 0.1, 0.1],
              properties=["GRABBABLE"]),
        _node(30, "door", "Doors", [0, 1.0, -3.9], [1.0, 2.0, 1.4]),
        _node(31, "doorjamb", "Decor", [0, 1.0, -3.95], [1.0, 2.1, 0.2]),
        _node(40, "bench", "Furniture", [100, 0.4, 100], [1.5, 0.5, 0.5],
              properties=["SITTABLE"]),
    ]
    edges = [
        {"from_id": 10, "to_id": 1, "relation_type": "INSIDE"},
        {"from_id": 11, "to_id": 1, "relation_type": "INSIDE"},
        {"from_id": 12, "to_id": 1, "relation_type": "INSIDE"},
        {"from_id": 20, "to_id": 1, "relation_type": "INSIDE"},
        {"from_id": 40, "to_id": 1, "relation_type": "INSIDE"},
    ]
    return {"nodes": nodes, "edges": edges}


def test_quat_rotation_matrix():
    np.testing.assert_allclose(quat_rotation_matrix(IDENT), np.eye(3), atol=1e-12)
    # 90 deg about +y
    c, s = np.cos(np.pi / 4), np.sin(np.pi / 4)
    R = quat_rotation_matrix([c, 0, s, 0])
    np.testing.assert_allclose(R @ np.array([1, 0, 0.0]), [0, 0, -1], atol=1e-12)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)


def test_box_prop_orthonormal_and_positive():
    c, s = np.cos(np.pi / 8), np.sin(np.pi / 8)
    node = _node(1, "sofa", "Furniture", [1, 2, 3], [2, 1, 0.5],
                 rotation=[c, 0, s, 0])
    centroid, size, R = box_prop(node)
    np.testing.assert_allclose(centroid, [1, 2, 3])
    assert (size > 0).all()
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)


def test_generate_room_programs_offline(tmp_path):
    out = generate_room_programs(
        scene_graph(), 0, CLASS_LABELS_RAW,
        out_dir=tmp_path / "script_bbox", scene_id=0, n_seq=4,
    )
    det_names = {n["class_name"] for n in out["nodes_for_det"]}
    # bench is out of room; door/apple are not detectable classes
    assert det_names == {"sofa", "fridge", "tv"}
    assert out["room_type"] == "livingroom"
    np.testing.assert_allclose(out["room_bbox"]["size"], [8, 3, 8], atol=0.2)

    assert out["scripts"] and len(out["scripts"]) == len(out["instance_ids"])
    for script, seq in zip(out["scripts"], out["instance_ids"]):
        assert all(isinstance(cmd, str) and cmd.startswith("<char0>")
                   for cmd in script)
        assert set(seq) <= set(range(3))
        assert len(set(seq)) == len(seq)
    # the fridge's put-in script grabs the apple
    assert any("[Grab] <apple>" in " ".join(s) for s in out["scripts"])

    scene_dir = tmp_path / "script_bbox" / "0"
    with open(scene_dir / "script_0.json") as f:
        assert json.load(f)["scripts"] == out["scripts"]
    with open(scene_dir / "bbox_0.json") as f:
        boxes = json.load(f)
    assert {b["class_name"] for b in boxes} == det_names
    for b in boxes:
        assert np.asarray(b["R_mat"]).shape == (3, 3)
        assert len(b["centroid"]) == 3 and len(b["size"]) == 3
    with open(scene_dir / "room_bbox_0.json") as f:
        rb = json.load(f)
    assert rb["room_type"] == "livingroom"


def test_probe_filters_interactions():
    """A simulator probe rejecting every fridge command drops the fridge,
    exactly like the reference's live render_script verification."""
    out = generate_room_programs(
        scene_graph(), 0, CLASS_LABELS_RAW,
        probe=lambda script: not any("fridge" in c for c in script),
        n_seq=2,
    )
    names = {n["class_name"] for n in out["nodes_for_det"]}
    assert names == {"sofa", "tv"}


def test_grabbable_inside_closed_container_excluded():
    """Grabbables locked in a CLOSED container are unusable, so the fridge
    (whose only interaction needs one) is dropped."""
    g = scene_graph()
    g["edges"].append({"from_id": 20, "to_id": 11, "relation_type": "INSIDE"})
    out = generate_room_programs(g, 0, CLASS_LABELS_RAW, n_seq=2)
    names = {n["class_name"] for n in out["nodes_for_det"]}
    assert names == {"sofa", "tv"}


def test_correct_door_bbox():
    g = scene_graph()
    door = [n for n in g["nodes"] if n["class_name"] == "door"][0]
    fixed = correct_door_bbox([door], g["nodes"])
    np.testing.assert_allclose(
        fixed[0]["bounding_box"]["center"], [0, 1.0, -3.95]
    )


def test_balance_instance_probs():
    nodes = [
        {"class_name": "sofa", "properties": ["SITTABLE"]},
        {"class_name": "fridge", "properties": ["CAN_OPEN"]},
        {"class_name": "tv", "properties": ["HAS_SWITCH"]},
        {"class_name": "tv", "properties": ["HAS_SWITCH"]},
    ]
    p = balance_instance_probs(nodes)
    assert p.shape == (4,) and p.min() > 0
    np.testing.assert_allclose(p.sum(), 1.0)
    # the duplicated class shares its mass: each tv gets less than the uniques
    assert p[2] < p[0] and p[3] < p[0]


# ---------------------------------------------------------------------------
# Stage 2: robust recording loop with a fake simulator
# ---------------------------------------------------------------------------

class FakeSim:
    """UnityCommunication-surface fake: writes a pd_script.txt recording; can
    hang on selected output paths to exercise the timeout/restart path."""

    def __init__(self, trajectory, hang_substrings=(), fail_substrings=()):
        self.trajectory = trajectory  # (F, 56, 3)
        self.hang_substrings = tuple(hang_substrings)
        self.fail_substrings = tuple(fail_substrings)
        self.closed = False

    def reset(self, scene_id):
        self.scene = scene_id

    def expand_scene(self, graph):
        return (True,)

    def add_character(self, name, initial_room=None):
        self.character = name

    def render_script(self, script, output_folder=None, **kw):
        if any(h in output_folder for h in self.hang_substrings):
            time.sleep(30)
        if any(h in output_folder for h in self.fail_substrings):
            return False, "render failed"
        out = os.path.join(output_folder, "script", "0")
        os.makedirs(out, exist_ok=True)
        with open(os.path.join(out, "pd_script.txt"), "w") as f:
            for i, frame in enumerate(self.trajectory):
                f.write(f"{i} " + " ".join(f"{x:.5f}" for x in frame.ravel()) + "\n")
        return True, None

    def close(self):
        self.closed = True


def _trajectory(F=40):
    """A 56-joint walk from the sofa to the fridge inside the fixture room."""
    rng = np.random.RandomState(0)
    hips = np.stack(
        [np.linspace(2, -2, F), np.full(F, 0.9), np.linspace(2, 1, F)], axis=1
    )
    joints = hips[:, None, :] + rng.randn(F, 56, 3) * 0.05
    return joints


@pytest.fixture
def stage1_outputs(tmp_path):
    generate_room_programs(
        scene_graph(), 0, CLASS_LABELS_RAW,
        out_dir=tmp_path / "script_bbox", scene_id=0, n_seq=2,
    )
    return tmp_path


def test_render_recordings_robustness(stage1_outputs):
    tmp_path = stage1_outputs
    sims = []

    def make_sim():
        # only the FIRST simulator instance hangs on script 0 / Male1: after
        # the restart the blacklist must prevent any retry of that script
        hang = ("0/Male1",) if not sims else ()
        sims.append(FakeSim(_trajectory(), hang_substrings=hang))
        return sims[-1]

    stats = render_recordings(
        make_sim,
        tmp_path / "script_bbox",
        tmp_path / "recording",
        {"0": scene_graph()},
        characters=("Chars/Male1", "Chars/Female2"),
        timeout_s=1,
    )
    assert stats["restarts"] == 1 and len(sims) == 2
    assert sims[0].closed  # hung simulator was shut down
    assert len(stats["failed"]) == 1
    assert len(stats["recorded"]) >= 1
    blacklist = tmp_path / "recording" / "failed_script_log.txt"
    assert blacklist.is_file() and blacklist.read_text().strip()

    # second pass: everything is either recorded or blacklisted -> all skipped
    stats2 = render_recordings(
        make_sim,
        tmp_path / "script_bbox",
        tmp_path / "recording",
        {"0": scene_graph()},
        characters=("Chars/Male1", "Chars/Female2"),
        timeout_s=1,
    )
    assert stats2["recorded"] == [] and stats2["restarts"] == 1 - 1
    assert len(stats2["skipped"]) == len(stats["recorded"]) + len(
        stats["failed"]
    ) + len(stats["skipped"])


def test_stage1_to_stage4_pipeline(tmp_path):
    """Scene graph -> programs -> (fake sim) recordings -> HDF5 samples ->
    splits -> loadable by the training dataset: the full datagen story with
    only the Unity binary swapped out."""
    from pose2room_tpu.data import P2RNetDataset
    from pose2room_tpu.datagen import generate_samples, generate_splits

    generate_room_programs(
        scene_graph(), 0, CLASS_LABELS_RAW,
        out_dir=tmp_path / "script_bbox", scene_id=0, n_seq=2,
    )
    render_recordings(
        lambda: FakeSim(_trajectory()),
        tmp_path / "script_bbox",
        tmp_path / "recording",
        {"0": scene_graph()},
        characters=("Chars/Male1",),
        timeout_s=0,
    )
    files = generate_samples(
        str(tmp_path / "recording"), str(tmp_path / "samples"), augment=False,
        n_workers=2,
    )
    assert files, "no samples written"
    split = generate_splits(
        files, str(tmp_path / "splits" / "script_level"), seed=2
    )
    ds = P2RNetDataset(
        str(tmp_path / "splits" / "script_level" / "train.json"), num_frames=32
    )
    sample = ds[0]
    assert sample["input_joints"].shape == (32, 53, 3)
    assert sample["box_label_mask"].sum() >= 1
