"""VOC-style AP evaluation for 3D oriented boxes.

Semantics parity with reference net_utils/eval_det.py (wo_mesh path):
``voc_ap`` (exact port of the PR-envelope integration, eval_det.py:93-123),
greedy confidence-ordered TP/FP matching per class (eval_det_cls_wo_mesh,
eval_det.py:259-343), aggregated per class into rec/prec/AP.

Performance redesign: the reference computes each det-gt IoU with a Python
polygon clipper inside a multiprocessing.Pool(10) over classes
(eval_det.py:424-473).  Here the full (n_det, n_gt) oriented-IoU matrix per
(scan, class) comes from the batched vectorized clipper in ops.boxes — the
greedy matching loop itself is trivially cheap — so no process pool is needed.
"""

import numpy as np

from pose2room_tpu.ops.boxes import box3d_iou_oriented


def voc_ap(rec, prec, use_07_metric=False):
    """VOC AP from recall/precision arrays (exact reference semantics)."""
    if use_07_metric:
        ap = 0.0
        for t in np.arange(0.0, 1.1, 0.1):
            p = np.max(prec[rec >= t]) if np.sum(rec >= t) > 0 else 0
            ap += p / 11.0
        return ap
    mrec = np.concatenate(([0.0], rec, [1.0]))
    mpre = np.concatenate(([0.0], prec, [0.0]))
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = np.maximum(mpre[i - 1], mpre[i])
    i = np.where(mrec[1:] != mrec[:-1])[0]
    return np.sum((mrec[i + 1] - mrec[i]) * mpre[i + 1])


def get_iou_obb(bb1, bb2):
    """Single-pair oriented 3D IoU (reference eval_det.py:86-88)."""
    iou3d, _ = box3d_iou_oriented(bb1, bb2, xp=np)
    return float(iou3d)


def eval_det_cls(pred, gt, ovthresh=0.25, use_07_metric=False):
    """Precision/recall/AP for a single class.

    Args:
        pred: {img_id: [(bbox(8,3), score)]}; gt: {img_id: [bbox(8,3)]}.
    Returns:
        (rec, prec, ap).
    """
    class_recs = {}
    npos = 0
    for img_id in gt.keys():
        bbox = np.array(gt[img_id])
        det = [False] * len(bbox)
        npos += len(bbox)
        class_recs[img_id] = {"bbox": bbox, "det": det}
    for img_id in pred.keys():
        if img_id not in gt:
            class_recs[img_id] = {"bbox": np.array([]), "det": []}

    image_ids, confidence, BB = [], [], []
    for img_id in pred.keys():
        for box, score in pred[img_id]:
            image_ids.append(img_id)
            confidence.append(score)
            BB.append(box)
    confidence = np.array(confidence)
    BB = np.array(BB)

    sorted_ind = np.argsort(-confidence)
    BB = BB[sorted_ind, ...] if len(BB) else BB
    image_ids = [image_ids[x] for x in sorted_ind]

    # vectorized IoU: for each scan, one (n_det_scan, n_gt_scan) matrix —
    # native C++ kernel when available, batched numpy clipper otherwise
    from pose2room_tpu import native

    use_native = native.available()
    iou_cache = {}
    for img_id in set(image_ids):
        det_idx = [d for d, x in enumerate(image_ids) if x == img_id]
        BBGT = class_recs[img_id]["bbox"]
        if BBGT.size == 0 or not det_idx:
            continue
        dets = BB[det_idx]  # (nd,8,3)
        if use_native:
            iou = native.oriented_iou_matrix(dets, BBGT)
        else:
            iou, _ = box3d_iou_oriented(
                dets[:, None, :, :], BBGT[None, :, :, :], xp=np
            )  # (nd, ngt)
        iou_cache[img_id] = (det_idx, iou)

    nd = len(image_ids)
    tp = np.zeros(nd)
    fp = np.zeros(nd)
    pos_in_scan = {}
    for d in range(nd):
        img_id = image_ids[d]
        R = class_recs[img_id]
        ovmax, jmax = -np.inf, -1
        if img_id in iou_cache:
            det_idx, iou = iou_cache[img_id]
            row = pos_in_scan.setdefault(img_id, 0)
            pos_in_scan[img_id] = row + 1
            ious = iou[row]
            jmax = int(np.argmax(ious))
            ovmax = float(ious[jmax])
        if ovmax > ovthresh:
            if not R["det"][jmax]:
                tp[d] = 1.0
                R["det"][jmax] = 1
            else:
                fp[d] = 1.0
        else:
            fp[d] = 1.0

    fp = np.cumsum(fp)
    tp = np.cumsum(tp)
    rec = tp / float(max(npos, 1))
    prec = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
    ap = voc_ap(rec, prec, use_07_metric)
    return rec, prec, ap


def eval_det(pred_all, gt_all, ovthresh=0.25, use_07_metric=False):
    """Per-class AP over all scans.

    Args:
        pred_all: {img_id: [(cls, bbox, score)]}; gt_all: {img_id: [(cls, bbox)]}.
    Returns:
        (rec, prec, ap) dicts keyed by class.
    """
    pred = {}
    gt = {}
    for img_id in pred_all.keys():
        for cls, bbox, score in pred_all[img_id]:
            pred.setdefault(cls, {}).setdefault(img_id, []).append((bbox, score))
    for img_id in gt_all.keys():
        for cls, bbox in gt_all[img_id]:
            gt.setdefault(cls, {}).setdefault(img_id, []).append(bbox)

    rec, prec, ap = {}, {}, {}
    for cls in gt.keys():
        rec[cls], prec[cls], ap[cls] = eval_det_cls(
            pred.get(cls, {}), gt[cls], ovthresh, use_07_metric
        )
    return rec, prec, ap


class APCalculator:
    """Accumulates per-scan predictions/GT and computes mAP/AR.

    Mirror of ap_helper.py:24-82 (without the vestigial mesh path)."""

    def __init__(self, ap_iou_thresh=0.25, class2type_map=None):
        self.ap_iou_thresh = ap_iou_thresh
        self.class2type_map = class2type_map
        self.reset()

    def step(self, batch_pred_map_cls, batch_gt_map_cls):
        assert len(batch_pred_map_cls) == len(batch_gt_map_cls)
        for i in range(len(batch_pred_map_cls)):
            self.gt_map_cls[self.scan_cnt] = batch_gt_map_cls[i]
            self.pred_map_cls[self.scan_cnt] = batch_pred_map_cls[i]
            self.scan_cnt += 1

    def compute_metrics(self):
        rec, prec, ap = eval_det(
            self.pred_map_cls, self.gt_map_cls, ovthresh=self.ap_iou_thresh
        )
        ret = {}
        for key in sorted(ap.keys()):
            clsname = self.class2type_map[key] if self.class2type_map else str(key)
            ret[f"{clsname} Average Precision"] = ap[key]
        vals = [v for v in ap.values() if not np.isnan(v)]
        ret["mAP"] = np.mean(vals) if vals else 0.0
        rec_list = []
        for key in sorted(ap.keys()):
            clsname = self.class2type_map[key] if self.class2type_map else str(key)
            try:
                ret[f"{clsname} Recall"] = rec[key][-1]
                rec_list.append(rec[key][-1])
            except (IndexError, TypeError):
                ret[f"{clsname} Recall"] = 0
                rec_list.append(0)
        ret["AR"] = np.mean([r for r in rec_list if not np.isnan(r)]) if rec_list else 0.0
        return ret

    def compute_metrics_w_mesh(self):
        """Box AP plus voxel-occupancy ("mesh") AP, `_mesh`-suffixed
        (reference ap_helper.py:84-125).  Requires scans accumulated with
        voxel payloads: pred entries (cls, bbox, score, voxels), gt entries
        (cls, bbox, voxels) — see eval/voxels.py."""
        from pose2room_tpu.eval.voxels import eval_det_w_mesh

        (rec, _prec, ap), (rec_m, _prec_m, ap_m) = eval_det_w_mesh(
            self.pred_map_cls, self.gt_map_cls, ovthresh=self.ap_iou_thresh
        )
        ret = {}
        for suffix, ap_d, rec_d in (("", ap, rec), ("_mesh", ap_m, rec_m)):
            recs = []
            for key in sorted(ap_d.keys()):
                name = self.class2type_map[key] if self.class2type_map else str(key)
                ret[f"{name} Average Precision{suffix}"] = ap_d[key]
                r = rec_d[key][-1] if len(rec_d[key]) else 0
                ret[f"{name} Recall{suffix}"] = r
                recs.append(r)
            vals = [v for v in ap_d.values() if not np.isnan(v)]
            ret[f"mAP{suffix}"] = np.mean(vals) if vals else 0.0
            ret[f"AR{suffix}"] = (
                np.mean([r for r in recs if not np.isnan(r)]) if recs else 0.0
            )
        return ret

    def synchronize_between_processes(self, allgather=None):
        """Merge accumulated scans from all processes.

        The reference's test loop accumulates AP state globally because its
        evaluation runs single-process; here each host evaluates only its data
        shard (data/loader.py per-host sharding), so a multi-host test run
        must union the per-scan pred/gt lists before ``compute_metrics`` —
        otherwise it silently reports shard-local mAP.  Scans are re-keyed
        densely in process order, preserving ap_helper.py:39-59 semantics
        (keys only need to be unique per scan).  ``allgather`` is injectable
        for tests; the default rides jax multihost_utils.
        """
        if allgather is None:
            from pose2room_tpu.parallel.collectives import (
                allgather_object as allgather,
            )
        states = allgather((self.pred_map_cls, self.gt_map_cls))
        if len(states) == 1:
            return
        merged_pred, merged_gt, cnt = {}, {}, 0
        for pred, gt in states:
            for k in sorted(pred.keys()):
                merged_pred[cnt] = pred[k]
                merged_gt[cnt] = gt[k]
                cnt += 1
        self.pred_map_cls, self.gt_map_cls, self.scan_cnt = (
            merged_pred, merged_gt, cnt,
        )

    def reset(self):
        self.gt_map_cls = {}
        self.pred_map_cls = {}
        self.scan_cnt = 0
