"""Eval-stack tests: AP matching vs reference port, parse_predictions parity."""

import numpy as np
import jax.numpy as jnp
import pytest

from pose2room_tpu.eval import (
    APCalculator,
    eval_det,
    voc_ap,
    parse_predictions,
    parse_groundtruths,
    assembly_pred_map_cls,
    assembly_gt_map_cls,
)
from pose2room_tpu.ops.boxes import get_3d_box
from pose2room_tpu.config.dataset_config import DatasetConfig


def _ref_eval_det_cls(pred, gt, ovthresh, get_iou):
    """Numpy port of eval_det.py:eval_det_cls_wo_mesh greedy matching."""
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
    nd = len(image_ids)
    tp = np.zeros(nd)
    fp = np.zeros(nd)
    for d in range(nd):
        R = class_recs[image_ids[d]]
        bb = BB[d]
        ovmax = -np.inf
        BBGT = R["bbox"]
        if BBGT.size > 0:
            for j in range(BBGT.shape[0]):
                iou = get_iou(bb, BBGT[j])
                if iou > ovmax:
                    ovmax = iou
                    jmax = j
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
    rec = tp / float(npos)
    prec = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
    return rec, prec, voc_ap(rec, prec)


def _random_box(rng, spread=2.0):
    size = rng.rand(3) * 1.5 + 0.3
    heading = rng.rand() * 2 * np.pi - np.pi
    center = rng.randn(3) * spread
    return get_3d_box(size, heading, center), (center, size, heading)


def test_perfect_predictions_map_one(rng):
    ap_calc = APCalculator(ap_iou_thresh=0.5)
    for scan in range(3):
        gts, preds = [], []
        for k in range(4):
            corners, _ = _random_box(rng)
            cls = rng.randint(0, 5)
            gts.append((cls, corners))
            preds.append((cls, corners, 0.9))
        ap_calc.step([preds], [gts])
    metrics = ap_calc.compute_metrics()
    assert abs(metrics["mAP"] - 1.0) < 1e-9
    assert abs(metrics["AR"] - 1.0) < 1e-9


def test_eval_det_matches_reference(rng):
    from pose2room_tpu.eval.ap import get_iou_obb

    pred_all, gt_all = {}, {}
    for scan in range(4):
        gts, preds = [], []
        for k in range(rng.randint(1, 5)):
            corners, (c, s, h) = _random_box(rng, spread=1.0)
            cls = rng.randint(0, 3)
            gts.append((cls, corners))
            # noisy prediction of the same box
            noisy = get_3d_box(s * rng.uniform(0.8, 1.2, 3), h + rng.randn() * 0.2,
                               c + rng.randn(3) * 0.3)
            preds.append((cls, noisy, rng.rand()))
        # plus some false positives
        for k in range(rng.randint(0, 3)):
            corners, _ = _random_box(rng, spread=1.0)
            preds.append((rng.randint(0, 3), corners, rng.rand()))
        pred_all[scan] = preds
        gt_all[scan] = gts

    rec, prec, ap = eval_det(pred_all, gt_all, ovthresh=0.25)

    # reference port
    pred_c, gt_c = {}, {}
    for img_id, lst in pred_all.items():
        for cls, bbox, score in lst:
            pred_c.setdefault(cls, {}).setdefault(img_id, []).append((bbox, score))
    for img_id, lst in gt_all.items():
        for cls, bbox in lst:
            gt_c.setdefault(cls, {}).setdefault(img_id, []).append(bbox)
    for cls in gt_c:
        r2, p2, a2 = _ref_eval_det_cls(pred_c.get(cls, {}), gt_c[cls], 0.25, get_iou_obb)
        np.testing.assert_allclose(rec[cls], r2, atol=1e-9)
        np.testing.assert_allclose(prec[cls], p2, atol=1e-9)
        assert abs(ap[cls] - a2) < 1e-9


def test_voc_ap_known_value():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 0.5])
    # envelope: 0.5*1.0 + 0.5*0.5
    assert abs(voc_ap(rec, prec) - 0.75) < 1e-12


def _fake_end_points(rng, B=2, K=8, C=22):
    center = rng.randn(B, K, 3).astype(np.float32)
    size_log = (rng.rand(B, K, 3) * 0.5 - 0.5).astype(np.float32)
    heading_angle = rng.rand(B, K).astype(np.float32) * 2 - 1
    heading = np.stack([np.sin(heading_angle), np.cos(heading_angle)], -1).astype(np.float32)
    return {
        "center": jnp.asarray(center),
        "size": jnp.asarray(size_log),
        "heading": jnp.asarray(heading),
        "sem_cls_scores": jnp.asarray(rng.randn(B, K, C).astype(np.float32)),
        "objectness_scores": jnp.asarray(rng.randn(B, K, 2).astype(np.float32)),
    }


def test_parse_predictions_corners_match_reference(rng):
    ds_cfg = DatasetConfig("virtualhome")
    end_points = _fake_end_points(rng)
    T, V = 32, 53
    joints = rng.randn(2, T, V, 3).astype(np.float32)
    gt_data = {"input_joints": jnp.asarray(joints)}
    cfg = {
        "dataset_config": ds_cfg,
        "remove_far_box": True,
        "use_3d_nms": True,
        "cls_nms": False,
        "nms_iou": 0.1,
        "use_old_type_nms": False,
        "per_class_proposal": True,
        "conf_thresh": 0.05,
        "sample_cls": False,
    }
    eval_dict, parsed = parse_predictions(end_points, gt_data, cfg)

    size = np.exp(np.asarray(end_points["size"]))
    heading = np.arctan2(
        np.asarray(end_points["heading"])[..., 0], np.asarray(end_points["heading"])[..., 1]
    )
    center = np.asarray(end_points["center"])
    for i in range(2):
        for j in range(8):
            expect = get_3d_box(size[i, j], float(heading[i, j]), center[i, j])
            np.testing.assert_allclose(
                parsed["pred_corners_3d"][i, j], expect, atol=1e-4
            )
    # NMS keeps at least one box per sample (when any box is nonempty)
    assert eval_dict["pred_mask"].shape == (2, 8)

    # assembly: per-class expansion count = n_kept * num_class
    out = assembly_pred_map_cls(eval_dict, parsed, cfg)
    for i in range(2):
        kept = sum(
            1
            for j in range(8)
            if eval_dict["pred_mask"][i, j] and parsed["obj_prob"][i, j] > 0.05
        )
        assert len(out["batch_pred_map_cls"][i]) == kept * ds_cfg.num_class


def test_parse_groundtruths(rng):
    B, K2 = 2, 10
    gt = {
        "center_label": jnp.asarray(rng.randn(B, K2, 3).astype(np.float32)),
        "size": jnp.asarray(rng.rand(B, K2, 3).astype(np.float32) * 0.3),
        "heading": jnp.asarray(
            np.stack([np.sin(h := rng.rand(B, K2) * 2 - 1), np.cos(h)], -1).astype(np.float32)
        ),
        "box_label_mask": jnp.asarray((np.arange(K2)[None] < 4).astype(np.float32).repeat(B, 0)),
        "sem_cls_label": jnp.asarray(rng.randint(0, 22, (B, K2))),
    }
    parsed = parse_groundtruths(gt)
    assert parsed["gt_corners_3d"].shape == (B, K2, 8, 3)
    # padding rows are zeroed
    assert (parsed["gt_corners_3d"][:, 4:] == 0).all()
    gt_map = assembly_gt_map_cls(parsed)
    assert len(gt_map) == B and len(gt_map[0]) == 4


def test_parse_predictions_bev_nms_path(rng):
    """use_3d_nms=False exercises the 2D BEV NMS branch."""
    ds_cfg = DatasetConfig("virtualhome")
    end_points = _fake_end_points(rng)
    joints = rng.randn(2, 16, 53, 3).astype(np.float32)
    cfg = {
        "dataset_config": ds_cfg, "remove_far_box": False, "use_3d_nms": False,
        "cls_nms": False, "nms_iou": 0.3, "use_old_type_nms": False,
        "per_class_proposal": False, "conf_thresh": 0.05, "sample_cls": False,
    }
    eval_dict, parsed = parse_predictions(
        end_points, {"input_joints": jnp.asarray(joints)}, cfg
    )
    assert eval_dict["pred_mask"].sum() >= 2  # at least one pick per sample

    # cls_nms branch
    cfg["use_3d_nms"] = True
    cfg["cls_nms"] = True
    eval_dict2, _ = parse_predictions(
        end_points, {"input_joints": jnp.asarray(joints)}, cfg
    )
    # class-gated suppression keeps at least as many boxes
    assert eval_dict2["pred_mask"].sum() >= eval_dict["pred_mask"].sum() - 2

    # sample_cls branch (categorical class sampling)
    cfg["sample_cls"] = True
    _, parsed3 = parse_predictions(
        end_points, {"input_joints": jnp.asarray(joints)}, cfg,
        rng=np.random.RandomState(0),
    )
    assert parsed3["pred_sem_cls"].shape == parsed["pred_sem_cls"].shape
    assert parsed3["pred_sem_cls"].max() < ds_cfg.num_class
