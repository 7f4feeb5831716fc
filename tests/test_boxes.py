"""Box geometry golden tests: corners, params round-trip, IoU vs scipy clipper."""

import numpy as np
import pytest

from pose2room_tpu.ops import (
    head2rot,
    rot2head,
    box_corners_from_params,
    get_3d_box,
    corners2params,
    box3d_iou_aabb,
    box3d_iou_oriented,
    points_in_obb,
)


def _ref_get_3d_box(box_size, heading_angle, center):
    """Numpy port of utils/pc_utils.py:get_3d_box + utils/tools.py:get_box_corners."""
    c, s = np.cos(heading_angle), np.sin(heading_angle)
    R = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])
    vectors = np.diag(np.asarray(box_size) / 2.0).dot(R)
    signs = [(-1, -1, -1), (1, -1, -1), (1, 1, -1), (-1, 1, -1),
             (-1, -1, 1), (1, -1, 1), (1, 1, 1), (-1, 1, 1)]
    return np.array([center + a * vectors[0] + b * vectors[1] + c2 * vectors[2]
                     for a, b, c2 in signs])


def _ref_oriented_iou(corners1, corners2):
    """Scipy-based port of net_utils/box_util.py:box3d_iou (polygon clip + hull)."""
    from scipy.spatial import ConvexHull

    def poly_area(x, y):
        return 0.5 * np.abs(np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1)))

    def polygon_clip(subject, clip):
        def inside(p, cp1, cp2):
            return (cp2[0] - cp1[0]) * (p[1] - cp1[1]) > (cp2[1] - cp1[1]) * (p[0] - cp1[0])

        def inter(cp1, cp2, s, e):
            dc = [cp1[0] - cp2[0], cp1[1] - cp2[1]]
            dp = [s[0] - e[0], s[1] - e[1]]
            n1 = cp1[0] * cp2[1] - cp1[1] * cp2[0]
            n2 = s[0] * e[1] - s[1] * e[0]
            n3 = 1.0 / (dc[0] * dp[1] - dc[1] * dp[0])
            return [(n1 * dp[0] - n2 * dc[0]) * n3, (n1 * dp[1] - n2 * dc[1]) * n3]

        out = subject
        cp1 = clip[-1]
        for cp2 in clip:
            inp = out
            out = []
            if not inp:
                return None
            s = inp[-1]
            for e in inp:
                if inside(e, cp1, cp2):
                    if not inside(s, cp1, cp2):
                        out.append(inter(cp1, cp2, s, e))
                    out.append(e)
                elif inside(s, cp1, cp2):
                    out.append(inter(cp1, cp2, s, e))
                s = e
            cp1 = cp2
        return out if out else None

    c1 = corners1[[7, 6, 2, 3, 4, 5, 1, 0]]
    c2 = corners2[[7, 6, 2, 3, 4, 5, 1, 0]]
    rect1 = [(c1[i, 0], c1[i, 2]) for i in range(3, -1, -1)]
    rect2 = [(c2[i, 0], c2[i, 2]) for i in range(3, -1, -1)]
    area1 = poly_area(np.array(rect1)[:, 0], np.array(rect1)[:, 1])
    area2 = poly_area(np.array(rect2)[:, 0], np.array(rect2)[:, 1])
    inter_p = polygon_clip(rect1, rect2)
    if inter_p is not None:
        inter_area = ConvexHull(inter_p).volume
    else:
        inter_area = 0.0
    iou_2d = inter_area / (area1 + area2 - inter_area)
    ymax = min(c1[0, 1], c2[0, 1])
    ymin = max(c1[4, 1], c2[4, 1])
    inter_vol = inter_area * max(0.0, ymax - ymin)

    def vol(c):
        a = np.linalg.norm(c[0] - c[1])
        b = np.linalg.norm(c[1] - c[2])
        h = np.linalg.norm(c[0] - c[4])
        return a * b * h

    iou = inter_vol / (vol(c1) + vol(c2) - inter_vol)
    return iou, iou_2d


def test_heading_roundtrip():
    for h in np.linspace(-np.pi + 1e-3, np.pi - 1e-3, 17):
        R = head2rot(float(h), xp=np)
        assert np.allclose(rot2head(R, xp=np), h, atol=1e-6)
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-6)


def test_corners_match_reference(rng):
    for _ in range(10):
        size = rng.rand(3) * 2 + 0.1
        heading = rng.rand() * 2 * np.pi - np.pi
        center = rng.randn(3)
        got = get_3d_box(size, heading, center)
        expect = _ref_get_3d_box(size, heading, center)
        np.testing.assert_allclose(got, expect, atol=1e-6)


def test_corners2params_roundtrip(rng):
    for _ in range(10):
        size = rng.rand(3) * 2 + 0.1
        heading = rng.rand() * 2 * np.pi - np.pi
        center = rng.randn(3)
        corners = get_3d_box(size, heading, center)
        size2, R2, center2 = corners2params(corners, xp=np)
        np.testing.assert_allclose(size2, size, atol=1e-5)
        np.testing.assert_allclose(center2, center, atol=1e-5)
        np.testing.assert_allclose(abs(rot2head(R2, xp=np) % np.pi - heading % np.pi) % np.pi, 0, atol=1e-4)


def test_oriented_iou_identity(rng):
    size = np.array([1.0, 2.0, 3.0])
    corners = get_3d_box(size, 0.3, np.zeros(3))
    iou, iou2d = box3d_iou_oriented(corners, corners, xp=np)
    assert np.allclose(iou, 1.0, atol=1e-5)
    assert np.allclose(iou2d, 1.0, atol=1e-5)


def test_oriented_iou_disjoint():
    c1 = get_3d_box(np.ones(3), 0.0, np.zeros(3))
    c2 = get_3d_box(np.ones(3), 0.0, np.array([10.0, 0, 0]))
    iou, iou2d = box3d_iou_oriented(c1, c2, xp=np)
    assert iou == 0.0 and iou2d == 0.0


def test_oriented_iou_random_vs_scipy(rng):
    mismatches = 0
    for _ in range(50):
        s1 = rng.rand(3) * 2 + 0.2
        s2 = rng.rand(3) * 2 + 0.2
        h1 = rng.rand() * 2 * np.pi - np.pi
        h2 = rng.rand() * 2 * np.pi - np.pi
        ctr1 = rng.randn(3) * 0.5
        ctr2 = rng.randn(3) * 0.5
        c1 = get_3d_box(s1, h1, ctr1)
        c2 = get_3d_box(s2, h2, ctr2)
        got, got2d = box3d_iou_oriented(c1, c2, xp=np)
        exp, exp2d = _ref_oriented_iou(c1, c2)
        assert abs(got - exp) < 1e-5, (got, exp)
        assert abs(got2d - exp2d) < 1e-5


def test_oriented_iou_batched(rng):
    c1 = np.stack([get_3d_box(rng.rand(3) + 0.2, rng.rand(), rng.randn(3) * 0.3) for _ in range(5)])
    c2 = np.stack([get_3d_box(rng.rand(3) + 0.2, rng.rand(), rng.randn(3) * 0.3) for _ in range(5)])
    iou_b, _ = box3d_iou_oriented(c1, c2, xp=np)
    for i in range(5):
        exp, _ = _ref_oriented_iou(c1[i], c2[i])
        assert abs(iou_b[i] - exp) < 1e-5


def test_aabb_iou():
    a = np.array([[0, 0, 0, 2, 2, 2]], dtype=np.float64)
    b = np.array([[1, 1, 1, 3, 3, 3], [10, 10, 10, 11, 11, 11]], dtype=np.float64)
    iou = box3d_iou_aabb(a, b, xp=np)
    assert abs(iou[0, 0] - 1.0 / 15.0) < 1e-9
    assert iou[0, 1] == 0.0


def test_points_in_obb_matches_hull(rng):
    from scipy.spatial import Delaunay

    for _ in range(5):
        size = rng.rand(3) * 2 + 0.5
        heading = rng.rand() * 2 * np.pi - np.pi
        center = rng.randn(3) * 0.3
        margin = 0.3
        # reference builds inflated corners then Delaunay in_hull
        inflated = get_3d_box(size + 2 * margin, heading, center)
        pts = rng.randn(200, 3) * 1.5
        hull = Delaunay(inflated)
        expect = hull.find_simplex(pts) >= 0
        got = points_in_obb(pts, center, size, heading, margin=margin, xp=np)
        # boundary points can differ by eps — exclude near-boundary
        local = np.abs((pts - center) @ head2rot(heading, xp=np).T)
        margin_dist = np.abs(local - (size / 2 + margin))
        interior = margin_dist.min(axis=1) > 1e-6
        np.testing.assert_array_equal(got[interior], expect[interior])
