"""NMS parity tests vs numpy ports of net_utils/nms.py."""

import numpy as np

from pose2room_tpu.ops import nms_2d_faster, nms_3d_faster, nms_3d_faster_samecls


def ref_nms_3d(boxes, thr, old_type=False, samecls=False):
    x1, y1, z1, x2, y2, z2 = (boxes[:, i] for i in range(6))
    score = boxes[:, 6]
    cls = boxes[:, 7] if samecls else None
    area = (x2 - x1) * (y2 - y1) * (z2 - z1)
    I = np.argsort(score)
    pick = []
    while I.size != 0:
        last = I.size
        i = I[-1]
        pick.append(i)
        xx1 = np.maximum(x1[i], x1[I[: last - 1]])
        yy1 = np.maximum(y1[i], y1[I[: last - 1]])
        zz1 = np.maximum(z1[i], z1[I[: last - 1]])
        xx2 = np.minimum(x2[i], x2[I[: last - 1]])
        yy2 = np.minimum(y2[i], y2[I[: last - 1]])
        zz2 = np.minimum(z2[i], z2[I[: last - 1]])
        l = np.maximum(0, xx2 - xx1)
        w = np.maximum(0, yy2 - yy1)
        h = np.maximum(0, zz2 - zz1)
        inter = l * w * h
        if old_type:
            o = inter / area[I[: last - 1]]
        else:
            o = inter / (area[i] + area[I[: last - 1]] - inter)
        if samecls:
            o = o * (cls[i] == cls[I[: last - 1]])
        I = np.delete(I, np.concatenate(([last - 1], np.where(o > thr)[0])))
    return pick


def _rand_boxes(rng, k, with_cls=False):
    ctr = rng.rand(k, 3) * 4
    half = rng.rand(k, 3) * 1.5 + 0.1
    cols = [ctr - half, ctr + half, rng.rand(k, 1)]
    if with_cls:
        cols.append(rng.randint(0, 3, size=(k, 1)).astype(float))
    return np.concatenate(cols, axis=1)


def test_nms_3d(rng):
    for _ in range(10):
        boxes = _rand_boxes(rng, 30)
        for thr in (0.1, 0.25, 0.5):
            assert nms_3d_faster(boxes, thr) == ref_nms_3d(boxes, thr)
            assert nms_3d_faster(boxes, thr, old_type=True) == ref_nms_3d(boxes, thr, old_type=True)


def test_nms_3d_samecls(rng):
    for _ in range(10):
        boxes = _rand_boxes(rng, 30, with_cls=True)
        assert nms_3d_faster_samecls(boxes, 0.25) == ref_nms_3d(boxes, 0.25, samecls=True)


def test_nms_2d(rng):
    k = 20
    ctr = rng.rand(k, 2) * 4
    half = rng.rand(k, 2) * 1.5 + 0.1
    boxes = np.concatenate([ctr - half, ctr + half, rng.rand(k, 1)], axis=1)
    # numpy 2D reference via the 3D one with a dummy z span
    boxes3d = np.concatenate(
        [boxes[:, 0:2], np.zeros((k, 1)), boxes[:, 2:4], np.ones((k, 1)), boxes[:, 4:5]], axis=1
    )
    assert nms_2d_faster(boxes, 0.3) == ref_nms_3d(boxes3d, 0.3)
