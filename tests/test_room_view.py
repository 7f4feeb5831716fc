"""Headless room-viewer tests (reference VTK viewer capability, PNG output)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def sample_file(tmp_path, rng):
    from pose2room_tpu.datagen import process_recording
    from pose2room_tpu.ops.boxes import head2rot

    room_bbox = {
        "centroid": np.array([0.0, 1.5, 0.0]),
        "size": np.array([8.0, 3.0, 8.0]),
        "R_mat": np.eye(3),
    }
    nodes = [
        {
            "class_name": raw,
            "centroid": room_bbox["centroid"] + rng.randn(3),
            "size": rng.rand(3) + 0.4,
            "R_mat": head2rot(float(rng.rand() * 2 - 1), xp=np),
        }
        for raw in ("sofa", "tv")
    ]
    F = 50
    joints = rng.randn(F, 53, 3) * 0.2 + room_bbox["centroid"]
    joints[:, :, 0] += np.linspace(-2, 2, F)[:, None]
    files = process_recording(
        joints, room_bbox, nodes, str(tmp_path / "s0_r0_sc0_c"), augment=False
    )
    assert files
    return files[0]


def test_render_room_composition(tmp_path, sample_file, rng):
    from pose2room_tpu.utils.room_view import read_sample_scene, render_room

    nodes, room_bbox, joints = read_sample_scene(sample_file)
    assert len(nodes) == 2 and joints.shape[1:] == (53, 3)
    assert set(room_bbox) == {"centroid", "size", "R_mat"}

    pred_obbs = np.array([[0.0, 1.0, 0.0, 1.0, 1.0, 1.0, 0.3]])
    out = str(tmp_path / "room.png")
    render_room(
        out,
        room_bbox=room_bbox,
        gt_nodes=nodes,
        pred_obbs=pred_obbs,
        pred_cls=np.array([3]),
        joints=joints,
        scene_points=rng.randn(5000, 3),
        skeleton_every=10,
        title="composite",
    )
    assert os.path.isfile(out) and os.path.getsize(out) > 10_000


def test_render_results_cli(tmp_path, sample_file):
    """The CLI composes a prediction dump with sample-HDF5 room context."""
    dump_dir = tmp_path / "dump"
    dump_dir.mkdir()
    np.savez(
        dump_dir / "000000_pred_confident_nms_bbox.npz",
        obbs=np.array([[0.0, 0.5, 0.0, 1.0, 1.0, 1.0, 0.1]]),
        cls=np.array([5]),
        inst_idx=np.array([True]),
    )
    out = tmp_path / "cli.png"
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "render_results.py"),
            str(dump_dir),
            "--sample", sample_file,
            "--skeleton-every", "20",
            "--out", str(out),
        ],
        capture_output=True,
        text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr
    assert out.is_file() and out.stat().st_size > 10_000


def test_render_results_cli_ply_overlay(tmp_path, sample_file):
    from pose2room_tpu.utils.vis import write_ply_points

    dump_dir = tmp_path / "dump"
    dump_dir.mkdir()
    ply = tmp_path / "scene.ply"
    write_ply_points(np.random.RandomState(0).randn(500, 3), str(ply))
    out = tmp_path / "ply.png"
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "render_results.py"),
            str(dump_dir),
            "--sample", sample_file,
            "--scene-points", str(ply),
            "--out", str(out),
        ],
        capture_output=True,
        text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr
    assert out.is_file()


def test_even_dist_joints_and_interaction_frames(rng):
    from pose2room_tpu.utils.room_view import (
        dist_node2bbox,
        get_even_dist_joints,
    )

    # hip moves fast early, then stands still: distance-even sampling must
    # concentrate frames in the moving part
    F = 100
    hips = np.zeros((F, 3))
    hips[:50, 0] = np.linspace(0, 10, 50)
    hips[50:, 0] = 10.0
    joints = np.repeat(hips[:, None, :], 53, axis=1)
    ids = get_even_dist_joints(joints, skip_rates=10)
    assert len(ids) == F // 10 + 1
    assert (ids <= 52).sum() >= len(ids) - 2  # nearly all in the moving half
    assert ids[0] == 0 and ids[-1] >= 49

    # interaction frame: pose 30 sits inside the node's bbox
    joints2 = rng.randn(40, 53, 3) + 100.0
    joints2[30] = rng.randn(53, 3) * 0.05
    node = {"centroid": np.zeros(3), "size": np.ones(3), "R_mat": np.eye(3)}
    got = dist_node2bbox([node], joints2.reshape(-1, 3), 53)
    assert list(got) == [30]
