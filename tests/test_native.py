"""Native C++ eval kernels vs numpy reference implementations."""

import numpy as np
import pytest

from pose2room_tpu import native
from pose2room_tpu.ops.boxes import get_3d_box, box3d_iou_oriented
from pose2room_tpu.ops.nms import nms_axis_aligned


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native library could not be built")


def test_iou_matrix_matches_numpy(rng):
    dets = np.stack(
        [get_3d_box(rng.rand(3) + 0.3, rng.rand() * 6 - 3, rng.randn(3)) for _ in range(20)]
    )
    gts = np.stack(
        [get_3d_box(rng.rand(3) + 0.3, rng.rand() * 6 - 3, rng.randn(3)) for _ in range(15)]
    )
    got = native.oriented_iou_matrix(dets, gts)
    expect, _ = box3d_iou_oriented(dets[:, None], gts[None, :], xp=np)
    np.testing.assert_allclose(got, expect, atol=1e-9)


def test_nms_matches_numpy(rng):
    for trial in range(10):
        k = 40
        ctr = rng.rand(k, 3) * 4
        half = rng.rand(k, 3) * 1.5 + 0.1
        minmax = np.concatenate([ctr - half, ctr + half], axis=1)
        scores = rng.rand(k)
        classes = rng.randint(0, 3, k).astype(float)
        for thr in (0.1, 0.3):
            assert native.greedy_nms(minmax, scores, thr) == nms_axis_aligned(
                minmax, scores, thr
            )
            assert native.greedy_nms(
                minmax, scores, thr, old_type=True
            ) == nms_axis_aligned(minmax, scores, thr, old_type=True)
            assert native.greedy_nms(
                minmax, scores, thr, classes=classes
            ) == nms_axis_aligned(minmax, scores, thr, classes=classes)


def test_iou_matrix_speed(rng):
    """Native path handles a large det x gt matrix quickly (sanity only)."""
    import time

    dets = np.stack(
        [get_3d_box(rng.rand(3) + 0.3, rng.rand(), rng.randn(3)) for _ in range(200)]
    )
    gts = dets[:50]
    t0 = time.perf_counter()
    native.oriented_iou_matrix(dets, gts)
    assert time.perf_counter() - t0 < 1.0
