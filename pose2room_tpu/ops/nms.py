"""Greedy score-sorted NMS on axis-aligned (BEV or 3D) boxes.

Semantics parity with reference net_utils/nms.py:7-119 (nms_2d_faster /
nms_3d_faster / nms_3d_faster_samecls): ascending argsort by score, pop the
highest remaining, suppress overlaps above threshold; ``old_type`` divides by
the candidate's own area instead of the union; the samecls variant gates
suppression on class equality.

These run on host numpy: NMS is inherently sequential and operates on <=128
boxes at batch size 1 — the expensive part (corner building, containment
pruning) runs on device in ``eval/parse.py``; only this tiny greedy loop
stays on host.  A unified ``nms_axis_aligned`` implements all three variants.
"""

import numpy as np


def nms_axis_aligned(minmax, scores, overlap_threshold, old_type=False, classes=None):
    """Greedy NMS.

    Args:
        minmax: (K, 2*d) boxes as (mins..., maxs...) with d = 2 or 3.
        scores: (K,) confidence.
        overlap_threshold: IoU threshold.
        old_type: use overlap/candidate-area instead of IoU.
        classes: optional (K,) — suppress only same-class overlaps.
    Returns:
        list of kept indices (in pick order, highest score first).
    """
    K, two_d = minmax.shape
    d = two_d // 2
    mins = minmax[:, :d]
    maxs = minmax[:, d:]
    area = np.prod(maxs - mins, axis=1)

    order = np.argsort(scores)
    pick = []
    while order.size != 0:
        i = order[-1]
        pick.append(int(i))
        rest = order[:-1]
        lo = np.maximum(mins[i], mins[rest])
        hi = np.minimum(maxs[i], maxs[rest])
        inter = np.prod(np.maximum(hi - lo, 0.0), axis=1)
        if old_type:
            o = inter / area[rest]
        else:
            o = inter / (area[i] + area[rest] - inter)
        if classes is not None:
            o = o * (classes[i] == classes[rest])
        order = rest[o <= overlap_threshold]
    return pick


def nms_2d_faster(boxes, overlap_threshold, old_type=False):
    """boxes: (K,5) as (x1,y1,x2,y2,score). Reference-compatible wrapper."""
    minmax = boxes[:, [0, 1, 2, 3]]
    return nms_axis_aligned(minmax, boxes[:, 4], overlap_threshold, old_type)


def nms_3d_faster(boxes, overlap_threshold, old_type=False):
    """boxes: (K,7) as (x1,y1,z1,x2,y2,z2,score)."""
    return nms_axis_aligned(boxes[:, :6], boxes[:, 6], overlap_threshold, old_type)


def nms_3d_faster_samecls(boxes, overlap_threshold, old_type=False):
    """boxes: (K,8) as (x1,y1,z1,x2,y2,z2,score,cls)."""
    return nms_axis_aligned(
        boxes[:, :6], boxes[:, 6], overlap_threshold, old_type, classes=boxes[:, 7]
    )
