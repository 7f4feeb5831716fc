"""Prediction/GT parsing: box decoding, pruning, NMS, per-class assembly.

Capability parity with reference net_utils/ap_helper.py:133-446, re-split for
TPU: everything embarrassingly parallel (exp(size), atan2 heading, softmax,
corner building for all B*K proposals at once, the remove_far_box
containment test against the hip trajectory) runs as ONE jit-compiled device
function; only the tiny sequential greedy NMS (<=128 boxes) and Python-list
assembly stay on host.  The reference instead loops per proposal on host and
tests containment with scipy Delaunay hulls (ap_helper.py:171-196) — the OBB
containment test here is mathematically identical for boxes.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pose2room_tpu.ops.boxes import box_corners_from_params, points_in_obb
from pose2room_tpu.ops.nms import nms_axis_aligned


@functools.partial(jax.jit, static_argnames=("remove_far_box", "contact_dist_thresh", "origin_joint_id"))
def _device_parse(
    center,
    size_log,
    heading_sincos,
    sem_cls_scores,
    objectness_scores,
    input_joints,
    remove_far_box=True,
    contact_dist_thresh=1.0,
    origin_joint_id=0,
):
    """Fused device-side half of parse_predictions.

    Returns corners (B,K,8,3), aabb (B,K,6), obj_prob (B,K),
    sem_cls_probs (B,K,C), pred_sem_cls (B,K), heading (B,K), size (B,K,3),
    nonempty (B,K) bool.
    """
    size = jnp.exp(size_log)
    heading = jnp.arctan2(heading_sincos[..., 0], heading_sincos[..., 1])
    sem_cls_probs = jax.nn.softmax(sem_cls_scores, axis=-1)
    pred_sem_cls = jnp.argmax(sem_cls_scores, axis=-1)
    obj_prob = jax.nn.softmax(objectness_scores, axis=-1)[..., 1]

    corners = box_corners_from_params(center, size, heading, xp=jnp)  # (B,K,8,3)
    aabb = jnp.concatenate(
        [jnp.min(corners, axis=2), jnp.max(corners, axis=2)], axis=-1
    )  # (B,K,6)

    if remove_far_box:
        degenerate = jnp.any((size < 0.01) | (size > 10.0), axis=-1)  # (B,K)
        hips = input_joints[:, :, origin_joint_id, 0:3]  # (B,N,3)
        # containment of any hip point in the margin-inflated OBB, per proposal
        inside = points_in_obb(
            hips[:, None, :, :],  # (B,1,N,3)
            center,
            size,
            heading,
            margin=contact_dist_thresh,
            xp=jnp,
        )  # (B,K,N)
        has_contact = jnp.any(inside, axis=-1)
        nonempty = (~degenerate) & has_contact
    else:
        nonempty = jnp.ones(center.shape[:2], dtype=bool)

    return corners, aabb, obj_prob, sem_cls_probs, pred_sem_cls, heading, size, nonempty


def parse_predictions_device(end_points, gt_data, config_dict):
    """Dispatch the fused device half of parse_predictions WITHOUT fetching.

    Returns the tuple of device arrays from ``_device_parse`` (dispatch is
    async, so the caller can overlap the device compute with host work for a
    previous batch — runners/test.py pipelines on this split).
    """
    dataset_config = config_dict["dataset_config"]
    return _device_parse(
        end_points["center"],
        end_points["size"],
        end_points["heading"],
        end_points["sem_cls_scores"],
        end_points["objectness_scores"],
        gt_data["input_joints"],
        remove_far_box=bool(config_dict.get("remove_far_box", True)),
        contact_dist_thresh=float(dataset_config.contact_dist_thresh),
        origin_joint_id=int(dataset_config.origin_joint_id),
    )


def parse_predictions(end_points, gt_data, config_dict, rng=None, _device_out=None):
    """Parse network outputs into corner boxes + NMS survival mask.

    Args/returns mirror ap_helper.py:parse_predictions: returns
    (eval_dict{'pred_mask'}, parsed{'pred_corners_3d','sem_cls_probs',
    'obj_prob','pred_sem_cls'}).  ``_device_out`` accepts a pre-dispatched
    ``parse_predictions_device`` result (pipelined callers); when absent the
    device half is dispatched (and waited on) here.
    """
    corners, aabb, obj_prob, sem_probs, pred_sem_cls, heading, size, nonempty = (
        _device_out
        if _device_out is not None
        else parse_predictions_device(end_points, gt_data, config_dict)
    )
    corners = np.asarray(corners)
    aabb = np.asarray(aabb)
    obj_prob = np.asarray(obj_prob)
    sem_probs = np.asarray(sem_probs)
    pred_sem_cls = np.asarray(pred_sem_cls)
    nonempty = np.asarray(nonempty)

    if config_dict.get("sample_cls", False):
        rng = rng or np.random
        B, K, C = sem_probs.shape
        flat = sem_probs.reshape(-1, C)
        cum = np.cumsum(flat, axis=1)
        u = rng.rand(len(flat), 1) * cum[:, -1:]
        pred_sem_cls = (u > cum).sum(axis=1).reshape(B, K)

    bsize, K = obj_prob.shape
    pred_mask = np.zeros((bsize, K), dtype=np.uint8)
    use_3d = config_dict.get("use_3d_nms", True)
    cls_nms = config_dict.get("cls_nms", False)
    nms_iou = config_dict.get("nms_iou", 0.1)
    old_type = config_dict.get("use_old_type_nms", False)

    for i in range(bsize):
        keep = np.where(nonempty[i])[0]
        if len(keep) == 0:
            continue
        if not use_3d:
            # BEV NMS over (x, z) extents
            minmax = aabb[i][keep][:, [0, 2, 3, 5]]
            pick = nms_axis_aligned(minmax, obj_prob[i, keep], nms_iou, old_type)
        elif cls_nms:
            pick = nms_axis_aligned(
                aabb[i][keep], obj_prob[i, keep], nms_iou, old_type,
                classes=pred_sem_cls[i, keep],
            )
        else:
            pick = nms_axis_aligned(aabb[i][keep], obj_prob[i, keep], nms_iou, old_type)
        pred_mask[i, keep[pick]] = 1

    eval_dict = {"pred_mask": pred_mask}
    parsed = {
        "pred_corners_3d": corners,
        "sem_cls_probs": sem_probs,
        "obj_prob": obj_prob,
        "pred_sem_cls": pred_sem_cls,
    }
    return eval_dict, parsed


@functools.partial(jax.jit)
def _gt_corners(center, size_log, heading_sincos):
    size = jnp.exp(size_log)
    heading = jnp.arctan2(heading_sincos[..., 0], heading_sincos[..., 1])
    return box_corners_from_params(center, size, heading, xp=jnp)


def parse_groundtruths_device(gt_data):
    """Dispatch GT corner building without fetching (see parse_predictions_device)."""
    return _gt_corners(gt_data["center_label"], gt_data["size"], gt_data["heading"])


def parse_groundtruths(gt_data, config_dict=None, _device_out=None):
    """GT corner boxes from the padded labels (ap_helper.py:257-292)."""
    corners = np.asarray(
        _device_out if _device_out is not None else parse_groundtruths_device(gt_data)
    )
    mask = np.asarray(gt_data["box_label_mask"])
    corners = corners * mask[:, :, None, None]  # zero out padding rows
    return {
        "sem_cls_label": np.asarray(gt_data["sem_cls_label"]),
        "gt_corners_3d": corners,
        "box_label_mask": mask,
    }


def assembly_pred_map_cls(eval_dict, parsed, config_dict):
    """Per-class proposal expansion into [(cls, corners, score), ...] lists.

    per_class_proposal=True: every surviving proposal contributes an entry for
    EVERY class, scored P(cls)*P(obj) (ap_helper.py:307-314).
    """
    corners = parsed["pred_corners_3d"]
    sem_probs = parsed["sem_cls_probs"]
    obj_prob = parsed["obj_prob"]
    pred_sem_cls = parsed["pred_sem_cls"]
    pred_mask = eval_dict["pred_mask"]
    conf_thresh = config_dict.get("conf_thresh", 0.05)
    num_class = config_dict["dataset_config"].num_class

    bsize, K = obj_prob.shape
    batch_pred_map_cls = []
    for i in range(bsize):
        keep = [
            j for j in range(K) if pred_mask[i, j] == 1 and obj_prob[i, j] > conf_thresh
        ]
        if config_dict.get("per_class_proposal", True):
            cur = [
                (c, corners[i, j], sem_probs[i, j, c] * obj_prob[i, j])
                for c in range(num_class)
                for j in keep
            ]
        else:
            cur = [
                (int(pred_sem_cls[i, j]), corners[i, j], obj_prob[i, j]) for j in keep
            ]
        batch_pred_map_cls.append(cur)
    eval_dict["batch_pred_map_cls"] = batch_pred_map_cls
    return eval_dict


def assembly_gt_map_cls(parsed_gts):
    """[(cls, corners), ...] per scan from parsed GT (ap_helper.py:402-432)."""
    sem = parsed_gts["sem_cls_label"]
    corners = parsed_gts["gt_corners_3d"]
    mask = parsed_gts["box_label_mask"]
    out = []
    for i in range(sem.shape[0]):
        out.append(
            [
                (int(sem[i, j]), corners[i, j])
                for j in range(corners.shape[1])
                if mask[i, j] == 1
            ]
        )
    return out
