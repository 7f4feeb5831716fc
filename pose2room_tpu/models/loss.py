"""P2RNet detection loss: vote + objectness + box (center/size/heading) + cls.

Semantics parity with reference models/loss.py:35-189 (BoxNetDetectionLoss):
* vote loss — gather GT hip votes at seed indices, pick the GT vote whose
  target is nearest ANY of the seed's 53 joints (via Chamfer between the 3 GT
  votes and the joints, loss.py:90-115), huber on (vote_xyz - chosen vote),
  masked mean;
* objectness — Chamfer between 128 proposal centers and the VALID GT centers
  -> object_assignment; label 1 within NEAR_THRESHOLD 0.3, supervised mask
  also beyond FAR_THRESHOLD 0.6; class-weighted CE [0.1, 0.9];
* box losses — bidirectional center Chamfer over the FULL padded GT array
  (matching loss.py:64-67 exactly, including padding zeros participating in
  dist1), huber on log-size and (sin,cos) heading against the assigned GT,
  CE on semantic class, all objectness-masked;
* total = 10*vote + 5*objectness + 10*center + 10*size + 10*heading + sem_cls.

The reference's per-sample Python loop over variable GT counts
(loss.py:127-133) is replaced by a masked fixed-shape Chamfer over the padded
10-box array: because padding is always a suffix, adding +BIG to padded
columns yields identical assignments and distances.
"""

import jax
import jax.numpy as jnp

from pose2room_tpu.ops import nn_distance, huber_loss

FAR_THRESHOLD = 0.6
NEAR_THRESHOLD = 0.3
GT_VOTE_FACTOR = 3
OBJECTNESS_CLS_WEIGHTS = (0.1, 0.9)
_BIG = 1e9


def _weighted_ce(logits, labels, weights=None):
    """Per-element cross entropy -w_y * log p_y (torch CrossEntropyLoss 'none')."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if weights is not None:
        w = jnp.asarray(weights)[labels]
        ce = ce * w
    return ce


def compute_vote_loss(end_points, gt_data, origin_joint_id=0):
    seed_skeleton = end_points["seed_skeleton"]  # (B,S,V,3)
    B, S, V, _ = seed_skeleton.shape
    vote_xyz = end_points["vote_xyz"]  # (B,S*vote_factor,3)
    seed_inds = end_points["seed_inds"]  # (B,S)

    # gather GT votes of the hip joint at the seed frames
    mask = jnp.take_along_axis(
        gt_data["vote_label_mask"][:, :, origin_joint_id], seed_inds, axis=1
    ).astype(jnp.float32)  # (B,S)
    votes = jnp.take_along_axis(
        gt_data["vote_label"][:, :, origin_joint_id, :], seed_inds[:, :, None], axis=1
    )  # (B,S,9)
    votes = votes.reshape(B, S, GT_VOTE_FACTOR, 3)
    votes = seed_skeleton[:, :, origin_joint_id : origin_joint_id + 1, :] + votes

    # choose, per seed, the GT vote whose target is nearest any joint
    flat_votes = votes.reshape(B * S, GT_VOTE_FACTOR, 3)
    flat_joints = seed_skeleton.reshape(B * S, V, 3)
    _, _, dist2, ind2 = nn_distance(flat_votes, flat_joints)
    # dist2 (B*S,V): per joint, distance to nearest vote; ind2: which vote
    jstar = jnp.argmin(dist2, axis=1)  # (B*S,)
    chosen = jnp.take_along_axis(ind2, jstar[:, None], axis=1)  # (B*S,1)
    gt_vote = jnp.take_along_axis(flat_votes, chosen[:, :, None], axis=1)[:, 0]
    gt_vote = gt_vote.reshape(B, S, 3)

    per_seed = jnp.mean(huber_loss(vote_xyz - gt_vote, delta=1.0), axis=-1)
    return jnp.sum(per_seed * mask) / (jnp.sum(mask) + 1e-6)


def compute_correspondence(end_points, gt_data):
    agg_xyz = end_points["aggregated_vote_xyz"]  # (B,K,3)
    gt_center = gt_data["center_label"][:, :, 0:3]  # (B,K2,3)
    box_mask = gt_data["box_label_mask"]  # (B,K2)

    diff = agg_xyz[:, :, None, :] - gt_center[:, None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)  # (B,K,K2)
    d2 = d2 + (1.0 - box_mask)[:, None, :] * _BIG  # mask padded GT columns
    dist1 = jnp.min(d2, axis=2)
    object_assignment = jnp.argmin(d2, axis=2)  # (B,K)

    euclid = jnp.sqrt(dist1 + 1e-6)
    objectness_label = (euclid < NEAR_THRESHOLD).astype(jnp.int32)
    objectness_mask = (
        (euclid < NEAR_THRESHOLD) | (euclid > FAR_THRESHOLD)
    ).astype(jnp.float32)

    ce = _weighted_ce(
        end_points["objectness_scores"], objectness_label, OBJECTNESS_CLS_WEIGHTS
    )
    objectness_loss = jnp.sum(ce * objectness_mask) / (jnp.sum(objectness_mask) + 1e-6)
    return object_assignment, objectness_loss, objectness_label, objectness_mask


def compute_box_and_sem_cls_loss(end_points, gt_data, object_assignment, objectness_label):
    objectness_label = objectness_label.astype(jnp.float32)
    denom = jnp.sum(objectness_label) + 1e-6

    # center: bidirectional Chamfer over FULL padded GT (reference loss.py:64-67)
    pred_center = end_points["center"]
    gt_center = gt_data["center_label"]
    box_mask = gt_data["box_label_mask"]
    dist1, _, dist2, _ = nn_distance(pred_center, gt_center)
    loss1 = jnp.sum(dist1 * objectness_label) / denom
    loss2 = jnp.sum(dist2 * box_mask) / (jnp.sum(box_mask) + 1e-6)
    center_loss = (loss1 + loss2) / 2.0

    # size (log-space huber)
    gt_size = jnp.take_along_axis(gt_data["size"], object_assignment[:, :, None], axis=1)
    size_l = jnp.mean(huber_loss(end_points["size"] - gt_size, delta=1.0), axis=-1)
    size_loss = jnp.sum(size_l * objectness_label) / denom

    # heading ((sin,cos) huber)
    gt_heading = jnp.take_along_axis(
        gt_data["heading"], object_assignment[:, :, None], axis=1
    )
    heading_l = jnp.mean(huber_loss(end_points["heading"] - gt_heading, delta=1.0), axis=-1)
    heading_loss = jnp.sum(heading_l * objectness_label) / denom

    # semantic class CE
    gt_cls = jnp.take_along_axis(gt_data["sem_cls_label"], object_assignment, axis=1)
    sem_l = _weighted_ce(end_points["sem_cls_scores"], gt_cls)
    sem_cls_loss = jnp.sum(sem_l * objectness_label) / denom

    return center_loss, size_loss, heading_loss, sem_cls_loss


def detection_loss(end_points, gt_data, origin_joint_id=0):
    """Full BoxNetDetectionLoss. Returns a dict of scalars (key 'total' drives
    the gradient; the rest are logging statistics)."""
    vote_loss = compute_vote_loss(end_points, gt_data, origin_joint_id)
    (
        object_assignment,
        objectness_loss,
        objectness_label,
        objectness_mask,
    ) = compute_correspondence(end_points, gt_data)
    center_loss, size_loss, heading_loss, sem_cls_loss = compute_box_and_sem_cls_loss(
        end_points, gt_data, object_assignment, objectness_label
    )
    total = (
        10.0 * vote_loss
        + 5.0 * objectness_loss
        + 10.0 * center_loss
        + 10.0 * size_loss
        + 10.0 * heading_loss
        + sem_cls_loss
    )

    n_prop = objectness_label.shape[0] * objectness_label.shape[1]
    pos_ratio = jnp.sum(objectness_label.astype(jnp.float32)) / n_prop
    neg_ratio = jnp.sum(objectness_mask) / n_prop - pos_ratio
    obj_pred = jnp.argmax(end_points["objectness_scores"], axis=2)
    obj_acc = jnp.sum(
        (obj_pred == objectness_label).astype(jnp.float32) * objectness_mask
    ) / (jnp.sum(objectness_mask) + 1e-6)

    return {
        "total": total,
        "vote_loss": vote_loss,
        "objectness_loss": objectness_loss,
        "center_loss": center_loss,
        "size_loss": size_loss,
        "heading_loss": heading_loss,
        "sem_cls_loss": sem_cls_loss,
        "pos_ratio": pos_ratio,
        "neg_ratio": neg_ratio,
        "obj_acc": obj_acc,
    }


def eval_nn_loss(end_points, gt_data):
    """Alternative validation loss — reference Trainer.eval_nn_loss
    (models/p2rnet/training.py:38-91; defined but unused in the reference
    loop): smooth-L1 Chamfer on centers over the VALID GT boxes, then
    size/heading/class penalties gathered at the per-proposal nearest-GT
    assignment, with NO objectness gating.

    The reference loops per sample because GT counts vary; here the padded
    fixed-shape (B, K2) GT array is masked instead (padding is a suffix, so
    +BIG on padded columns preserves every argmin index the reference's
    valid-prefix slice would produce).  total = 10*center + 10*size +
    10*heading + sem_cls (training.py:83).
    """
    pred_center = end_points["center"]  # (B,K,3)
    gt_center = gt_data["center_label"][:, :, 0:3]  # (B,K2,3)
    box_mask = gt_data["box_label_mask"]  # (B,K2)
    B, K = pred_center.shape[:2]

    # pairwise smooth-L1 distance (nn_distance l1smooth=True semantics)
    diff = pred_center[:, :, None, :] - gt_center[:, None, :, :]
    pc_dist = jnp.sum(huber_loss(diff, delta=1.0), axis=-1)  # (B,K,K2)
    pc_dist = pc_dist + (1.0 - box_mask)[:, None, :] * _BIG
    dist1 = jnp.min(pc_dist, axis=2)  # (B,K)
    object_assignment = jnp.argmin(pc_dist, axis=2)  # (B,K)
    dist2 = jnp.min(pc_dist, axis=1)  # (B,K2); padded cols masked in the sum

    centroid_reg_loss1 = jnp.sum(dist1) / (B * K + 1e-6)
    centroid_reg_loss2 = jnp.sum(dist2 * box_mask) / (jnp.sum(box_mask) + 1e-6)
    center_loss = (centroid_reg_loss1 + centroid_reg_loss2) / 2.0

    gt_size = jnp.take_along_axis(
        gt_data["size"], object_assignment[:, :, None], axis=1
    )
    size_loss = jnp.mean(
        jnp.mean(huber_loss(end_points["size"] - gt_size, delta=1.0), axis=-1)
    )
    gt_heading = jnp.take_along_axis(
        gt_data["heading"], object_assignment[:, :, None], axis=1
    )
    heading_loss = jnp.mean(
        jnp.mean(huber_loss(end_points["heading"] - gt_heading, delta=1.0), axis=-1)
    )
    gt_cls = jnp.take_along_axis(gt_data["sem_cls_label"], object_assignment, axis=1)
    sem_cls_loss = jnp.mean(_weighted_ce(end_points["sem_cls_scores"], gt_cls))

    total = 10.0 * center_loss + 10.0 * size_loss + 10.0 * heading_loss + sem_cls_loss
    return {
        "total": total,
        "center_loss": center_loss,
        "size_loss": size_loss,
        "heading_loss": heading_loss,
        "sem_cls_loss": sem_cls_loss,
        "centroid_reg_loss1": centroid_reg_loss1,
        "centroid_reg_loss2": centroid_reg_loss2,
    }
