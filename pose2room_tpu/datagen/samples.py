"""Sample generation: recordings -> reference-schema HDF5 training samples.

Capability parity with reference utils/virtualhome/3_generate_samples.py
(the post-Unity half of the data-synthesis pipeline — stages 1-2 drive a
Unity simulator binary that is not distributable; this module consumes the
skeleton recordings those stages produce, or any (F, 53, 3) skeleton array):

* trims initial poses outside the room (3_generate_samples.py:100-106) and
  rejects clips that never pass near an object (:110-124);
* recenters the world at the room's floor centroid (:126-134);
* maps raw class names -> 22 canonical classes (:136-147, vhome_utils
  class_mapping);
* 8x flip/rot90 augmentation (aug_idx 0..7: rot90^k, then the same with an
  x<->z flip, :19-53);
* per-joint GT votes: joints within a bbox inflated by contact_dist_thresh
  get up to 3 centroid-offset votes + mask; unused slots are padded with the
  first vote (:56-79);
* writes HDF5 {skeleton_joints, skeleton_joint_votes, room_bbox,
  object_nodes} (:186-193).
"""

import os
from copy import deepcopy

import numpy as np

from pose2room_tpu.config.dataset_config import CLASS_LABELS_RAW, CLASS_MAPPING, CLASS_LABELS
from pose2room_tpu.ops.boxes import points_in_obb, rot2head

FLIP = np.array([[0, 0, 1], [0, 1, 0], [1, 0, 0]], dtype=np.float64)
ROT90 = np.array([[0, 0, -1], [0, 1, 0], [1, 0, 0]], dtype=np.float64)  # ccw
GT_VOTE_FACTOR = 3


def class_mapping(raw_names):
    """Raw VirtualHome class names -> canonical (id, name) lists."""
    ids = [CLASS_MAPPING[CLASS_LABELS_RAW.index(n)] for n in raw_names]
    return ids, [CLASS_LABELS[i] for i in ids]


def check_in_box(points, box_prop):
    """Points inside an oriented box given {centroid,size,R_mat} (exact OBB)."""
    centroid = np.asarray(box_prop["centroid"], dtype=np.float64)
    size = np.asarray(box_prop["size"], dtype=np.float64)
    R = np.asarray(box_prop["R_mat"], dtype=np.float64)
    offsets_proj = np.abs((points - centroid) @ R.T)
    return np.min(offsets_proj <= size / 2.0, axis=-1)


def read_pd_script(path, n_joints_total=56, valid_joint_ids=None):
    """Parse a VirtualHome ``pd_script.txt`` pose recording.

    Format: one line per frame, whitespace-separated floats — a leading frame
    index followed by n_joints_total * 3 world coordinates.  The 53 modeled
    joints are selected via ``valid_joint_ids`` (drops Jaw/UpperChest/
    LastBone, reference utils/virtualhome/__init__.py:36-38).
    """
    if valid_joint_ids is None:
        valid_joint_ids = [i for i in range(n_joints_total) if i not in (23, 54, 55)]
    rows = []
    with open(path) as f:
        for line in f:
            vals = line.split()
            if not vals:
                continue
            coords = np.array(vals, dtype=np.float64)
            if coords.size == n_joints_total * 3 + 1:
                coords = coords[1:]
            if coords.size != n_joints_total * 3:
                continue
            rows.append(coords.reshape(n_joints_total, 3))
    joints = np.asarray(rows)
    return joints[:, valid_joint_ids, :]


def augment_8(room_bbox, object_nodes, skeleton_joints, aug_idx):
    """One of 8 flip/rot90 variants; aug_idx 0 = identity."""
    room_bbox = deepcopy(room_bbox)
    object_nodes = deepcopy(object_nodes)
    skeleton_joints = np.array(skeleton_joints, dtype=np.float64)
    if aug_idx > 3:
        skeleton_joints = skeleton_joints @ FLIP
        for box in [room_bbox] + object_nodes:
            box["centroid"] = np.asarray(box["centroid"]) @ FLIP
            R = np.asarray(box["R_mat"]) @ FLIP
            R[2] = np.cross(R[0], R[1])
            box["R_mat"] = R
    rot = np.linalg.matrix_power(ROT90, aug_idx % 4)
    skeleton_joints = skeleton_joints @ rot
    for box in [room_bbox] + object_nodes:
        box["centroid"] = np.asarray(box["centroid"]) @ rot
        box["R_mat"] = np.asarray(box["R_mat"]) @ rot
    return room_bbox, object_nodes, skeleton_joints


def compute_votes(object_nodes, skeleton_joints, contact_dist=1.0):
    """(F,V,10) per-joint vote targets [mask, 3x centroid offsets]."""
    F, V, _ = skeleton_joints.shape
    flat = skeleton_joints.reshape(F * V, 3)
    votes = np.zeros((F * V, 1 + 3 * GT_VOTE_FACTOR))
    vote_idx = np.zeros(F * V, dtype=np.int64)
    for node in object_nodes:
        heading = rot2head(np.asarray(node["R_mat"]), xp=np)
        inside = points_in_obb(
            flat,
            np.asarray(node["centroid"], dtype=np.float64),
            np.asarray(node["size"], dtype=np.float64),
            heading,
            margin=contact_dist,
            xp=np,
        )
        offsets = np.asarray(node["centroid"])[None] - flat
        inds = np.where(inside)[0]
        votes[inds, 0] = 1
        for j in inds:
            k = vote_idx[j]
            votes[j, 1 + 3 * k : 4 + 3 * k] = offsets[j]
            if k == 0:  # pad remaining slots with the first vote
                votes[j, 4:7] = offsets[j]
                votes[j, 7:10] = offsets[j]
        vote_idx[inds] = np.minimum(2, vote_idx[inds] + 1)
    return votes.reshape(F, V, -1)


def process_recording(
    skeleton_joints,
    room_bbox,
    object_nodes,
    out_path_base,
    origin_joint_id=0,
    contact_dist=1.0,
    augment=True,
):
    """Full stage-3 processing of one recording.

    Args:
        skeleton_joints: (F, 53, 3) world-space joints.
        room_bbox: {centroid, size, R_mat}.
        object_nodes: [{class_name (raw), centroid, size, R_mat}, ...].
        out_path_base: output path prefix; ``_<aug_idx>.hdf5`` is appended.
    Returns:
        list of written files ([] when the recording is rejected).
    """
    import h5py

    skeleton_joints = np.asarray(skeleton_joints, dtype=np.float64)
    hips = skeleton_joints[:, origin_joint_id]

    # trim initial out-of-room poses; reject if never in the room
    in_room = check_in_box(hips, room_bbox)
    if not in_room.any():
        return []
    skeleton_joints = skeleton_joints[list(in_room).index(True):]
    hips = skeleton_joints[:, origin_joint_id]

    # reject when the trajectory never passes near any object
    near_any = False
    for node in object_nodes:
        dummy = dict(node)
        dummy["size"] = np.asarray(node["size"]) + 2 * contact_dist
        if check_in_box(hips, dummy).any():
            near_any = True
            break
    if not near_any:
        return []

    # recenter world at the room floor centroid
    room_bbox = deepcopy(room_bbox)
    object_nodes = deepcopy(object_nodes)
    room_centroid = np.asarray(room_bbox["centroid"], dtype=np.float64).copy()
    room_centroid[1] -= np.asarray(room_bbox["size"])[1] / 2.0
    room_bbox["centroid"] = np.asarray(room_bbox["centroid"]) - room_centroid
    for node in object_nodes:
        node["centroid"] = np.asarray(node["centroid"]) - room_centroid
    skeleton_joints = skeleton_joints - room_centroid

    # raw -> canonical classes
    for node in object_nodes:
        if "class_name" in node and "class_id" not in node:
            ids, names = class_mapping([node["class_name"]])
            node["class_id"] = ids[0]
            node["class_name"] = names[0]

    written = []
    for aug_idx in range(8) if augment else [0]:
        rb, nodes, joints = augment_8(room_bbox, object_nodes, skeleton_joints, aug_idx)
        votes = compute_votes(nodes, joints, contact_dist)
        path = f"{out_path_base}_{aug_idx}.hdf5"
        with h5py.File(path, "w") as f:
            f.create_dataset("skeleton_joints", data=joints.astype(np.float32))
            f.create_dataset("skeleton_joint_votes", data=votes.astype(np.float32))
            rg = f.create_group("room_bbox")
            for k in ("centroid", "size", "R_mat"):
                rg.create_dataset(k, data=np.asarray(rb[k], dtype=np.float32))
            og = f.create_group("object_nodes")
            for i, node in enumerate(nodes):
                g = og.create_group(str(i))
                g.create_dataset("class_id", data=np.array([node["class_id"]], dtype=np.int64))
                for k in ("centroid", "size", "R_mat"):
                    g.create_dataset(k, data=np.asarray(node[k], dtype=np.float32))
        written.append(path)
    return written


def generate_samples(recording_root, sample_dir, augment=True, n_workers=8):
    """Process every pd_script.txt recording under ``recording_root``.

    Expects the reference's directory layout: a sibling ``script_bbox/``
    tree holding room_bbox_<room>.json / bbox_<room>.json files (stage-1
    outputs).  Returns the list of written sample files.
    """
    import glob
    import json
    from concurrent.futures import ThreadPoolExecutor

    os.makedirs(sample_dir, exist_ok=True)
    sk_files = sorted(
        glob.glob(os.path.join(recording_root, "**", "pd_script.txt"), recursive=True)
    )

    def handle(sk_file):
        parts = os.path.relpath(sk_file, recording_root).split(os.sep)
        if len(parts) < 4:
            return []
        scene_id, room_id, script_id, char_name = parts[:4]
        bbox_dir = os.path.join(os.path.dirname(recording_root), "script_bbox", scene_id)
        try:
            with open(os.path.join(bbox_dir, f"room_bbox_{room_id}.json")) as f:
                room_bbox = json.load(f)["room_bbox"]
            with open(os.path.join(bbox_dir, f"bbox_{room_id}.json")) as f:
                object_nodes = json.load(f)
        except FileNotFoundError:
            return []
        joints = read_pd_script(sk_file)
        base = os.path.join(
            sample_dir, "_".join([scene_id, room_id, script_id, char_name])
        )
        return process_recording(joints, room_bbox, object_nodes, base, augment=augment)

    written = []
    with ThreadPoolExecutor(max_workers=n_workers) as pool:
        for result in pool.map(handle, sk_files):
            written.extend(result)
    return written
