"""Voxel-occupancy ("mesh") IoU eval + virtual-scanning (TSDF) tests."""

import numpy as np
import pytest

from pose2room_tpu.eval.voxels import (
    OccupancyGrid,
    compute_mesh_iou,
    eval_det_w_mesh,
    voxelize_box,
)
from pose2room_tpu.ops.boxes import box3d_iou_aabb, get_3d_box


def test_voxelize_box_counts():
    internal, surface = voxelize_box(
        np.array([1.0, 1.0, 1.0, 0.8, 0.8, 0.8, 0.0]), voxel_size=0.1
    )
    total = internal.filled_count + surface.filled_count
    assert abs(total - 8 ** 3) <= 3 * 8 * 8  # ~volume/voxel^3
    assert internal.filled_count > 0 and surface.filled_count > 0
    # surface is a hollow shell: its voxels are not internal
    assert not internal.is_filled(surface.points).any()


def test_mesh_iou_identity_and_disjoint():
    v1 = voxelize_box(np.array([0, 0, 0, 1, 1, 1, 0.3]), voxel_size=0.1)
    v2 = voxelize_box(np.array([5, 5, 5, 1, 1, 1, 0.0]), voxel_size=0.1)
    assert compute_mesh_iou(v1, v1) == pytest.approx(1.0)
    assert compute_mesh_iou(v1, v2) == 0.0
    empty = (OccupancyGrid(np.zeros((0, 3)), 0.1),) * 2
    assert compute_mesh_iou(v1, empty) == 0.0


def test_mesh_iou_matches_aabb_iou():
    """For axis-aligned boxes the reference's alpha-combination reduces to
    exact volume IoU: (a1*a2)/(a1+a2-a1*a2) with a_i = I/V_i == I/union."""
    a = np.array([0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0])
    b = np.array([0.4, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0])
    va = voxelize_box(a, voxel_size=0.05)
    vb = voxelize_box(b, voxel_size=0.05)
    got = compute_mesh_iou(va, vb)
    want = float(
        box3d_iou_aabb(
            np.array([[-0.5, -0.5, -0.5, 0.5, 0.5, 0.5]]),
            np.array([[-0.1, -0.5, -0.5, 0.9, 0.5, 0.5]]),
            xp=np,
        )[0, 0]
    )
    assert got == pytest.approx(want, abs=0.04)


def test_eval_det_w_mesh_perfect_predictions():
    scans = {}
    gts = {}
    rng = np.random.RandomState(0)
    for scan in range(3):
        preds, gt = [], []
        for g in range(2):
            cls = int(rng.randint(0, 2))
            obb = np.concatenate([rng.randn(3), 0.5 + rng.rand(3), [0.0]])
            corners = get_3d_box(obb[3:6], obb[6], obb[0:3])
            vox = voxelize_box(obb, voxel_size=0.1)
            preds.append((cls, corners, 0.9, vox))
            gt.append((cls, corners, vox))
        scans[scan] = preds
        gts[scan] = gt
    (_, _, ap), (_, _, ap_m) = eval_det_w_mesh(scans, gts, ovthresh=0.25)
    for cls in ap:
        assert ap[cls] == pytest.approx(1.0)
        assert ap_m[cls] == pytest.approx(1.0)


def test_apcalculator_mesh_mode():
    from pose2room_tpu.eval import APCalculator

    calc = APCalculator(0.25, {0: "sofa", 1: "tv"})
    obb = np.array([0, 0.5, 0, 1, 1, 1, 0.2])
    corners = get_3d_box(obb[3:6], obb[6], obb[0:3])
    vox = voxelize_box(obb, voxel_size=0.1)
    calc.step([[(0, corners, 0.9, vox)]], [[(0, corners, vox)]])
    ret = calc.compute_metrics_w_mesh()
    assert ret["mAP"] == pytest.approx(1.0)
    assert ret["mAP_mesh"] == pytest.approx(1.0)
    assert "sofa Average Precision_mesh" in ret


# ---------------------------------------------------------------------------
# Virtual scanning (TSDF)
# ---------------------------------------------------------------------------

def _pinhole_K(w=64, h=48, f=50.0):
    return np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])


def test_pc_from_depth_plane():
    from pose2room_tpu.datagen.scanning import pc_from_depth

    K = _pinhole_K()
    depth = np.full((48, 64), 2.0)
    RT = np.eye(4)
    RT[:3, 3] = [1.0, 2.0, 3.0]
    pts, _ = pc_from_depth(depth, K, RT)
    # camera looks down +z from (1,2,3): all points on the z=5 plane
    np.testing.assert_allclose(pts[:, 2], 5.0, atol=1e-9)
    assert pts[:, 0].min() < 1.0 < pts[:, 0].max()


def test_tsdf_plane_surface():
    from pose2room_tpu.datagen.scanning import TSDFVolume

    K = _pinhole_K()
    depth = np.full((48, 64), 2.0)
    RT = np.eye(4)
    vol = TSDFVolume(np.array([[-1.5, 1.5], [-1.5, 1.5], [0.0, 3.0]]), 0.1)
    vol.integrate(depth, K, RT)
    surf = vol.surface_points()
    assert len(surf) > 0
    # surface voxels cluster at the observed plane z=2
    assert np.abs(surf[:, 2] - 2.0).mean() < 0.35


def test_read_frames_with_fake_camera_source():
    from pose2room_tpu.datagen.scanning import read_frames

    w, h, f = 64, 48, 50.0

    class FakeCams:
        """Two views of a wall at z=2 (GL conventions on the way in)."""

        def camera_data(self, frame_ids):
            # build a GL projection whose intrinsics round-trip to _pinhole_K
            P = np.zeros((4, 4))
            P[0, 0] = 2 * f / w
            P[1, 1] = 2 * f / h
            P[0, 2] = 1 - 2 * (w / 2) / w  # cx = w/2
            P[1, 2] = 2 * (h / 2) / h - 1  # cy = h/2
            zn, zf = 0.1, 20.0
            P[2, 2] = (zf + zn) / (zn - zf)
            P[2, 3] = 2 * zf * zn / (zn - zf)
            P[3, 2] = -1
            # world2cam whose get_cam_extrinsics inverse is identity-ish:
            # cam2world = inv(W); cam2world[:3,:3]*=-1; cam2world[:,0]*=-1
            cam2world_target = np.eye(4)
            W = cam2world_target.copy()
            W[:3, :3] *= -1
            W[:, 0] *= -1
            W = np.linalg.inv(W)
            data = {
                "projection_matrix": P.reshape(-1, order="F").tolist(),
                "world_to_camera_matrix": W.reshape(-1, order="F").tolist(),
            }
            return True, [data for _ in frame_ids]

        def camera_image(self, frame_id, mode="depth", image_width=64,
                         image_height=48):
            if mode == "depth":
                return True, [np.full((image_height, image_width, 1), 2.0)]
            return True, [np.zeros((image_height, image_width, 3), np.uint8)]

    out = read_frames(FakeCams(), [0, 1], im_size=(w, h), voxel_size=0.1)
    assert out["scene_vox"].any()
    surf = out["tsdf"].surface_points()
    assert len(surf) > 0
    pts = np.vstack(out["points_world"]["pc"])
    np.testing.assert_allclose(pts[:, 2], 2.0, atol=1e-6)


def test_generate_cameras():
    from pose2room_tpu.datagen.scanning import generate_cameras

    room = {"centroid": np.zeros(3) + [0, 1.5, 0],
            "size": np.array([8.0, 3.0, 8.0]), "R_mat": np.eye(3)}
    obstacle = {"centroid": np.array([2.0, 1.0, 2.0]),
                "size": np.array([2.0, 2.0, 2.0]), "R_mat": np.eye(3)}
    locs, angles = generate_cameras(room, [obstacle], loc_step=1.5)
    assert len(locs) > 0
    # no camera inside the obstacle
    assert not (
        (np.abs(locs[:, 0, :] - obstacle["centroid"]) <= 1.0).all(axis=1)
    ).any()
    # pitch/yaw pairs include straight up/down
    assert any((p == [-90.0, 0.0]).all() for p in angles)
    assert angles.shape[1] == 2

def test_mesh_iou_overlapping_internal_surface_counts_once():
    """Occupancies whose internal and surface sets OVERLAP (binvox/TSDF
    grids do) must count a doubly-filled point once — the reference's numpy
    bool + bool is logical OR; integer summing lets a_i exceed 1 and the
    IoU formula blow past 1."""
    idx = np.stack(
        np.meshgrid(*(np.arange(4),) * 3, indexing="ij"), axis=-1
    ).reshape(-1, 3)
    # same cube registered as BOTH internal and surface
    grid = OccupancyGrid(idx, 0.1)
    v = (grid, grid)
    iou = compute_mesh_iou(v, v)
    assert 0.0 < iou <= 1.0
    assert iou == pytest.approx(1.0)


def test_occupancy_is_filled_vectorized_membership():
    idx = np.array([[0, 0, 0], [2, -3, 5], [-7, 1, 0]])
    grid = OccupancyGrid(idx, 0.5)
    pts = (np.array([[0, 0, 0], [2, -3, 5], [1, 1, 1], [-7, 1, 0]]) + 0.5) * 0.5
    np.testing.assert_array_equal(
        grid.is_filled(pts), [True, True, False, True]
    )
    assert grid.filled_count == 3
