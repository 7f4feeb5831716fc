#!/usr/bin/env python
"""Headless viewer: render dumped prediction/GT boxes + skeleton to PNG.

Capability parity with the reference's VTK viewers (utils/virtualhome/
vis_results.py 'pred/gt' mode, vis_gt_vh.py) for headless environments:
reads the ``%06d_pred_confident_nms_bbox.npz`` / ``%06d_gt_bbox.npz`` files
dumped by test/demo runs (same formats as models/p2rnet/testing.py) and an
optional pose clip, and writes a 3D matplotlib render.

Usage:
    python scripts/render_results.py <dump_dir> [--joints clip.npy]
        [--out out.png]
"""

import argparse
import glob
import os

import numpy as np


def draw_box(ax, obb, color, label=None):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from pose2room_tpu.ops.boxes import box_corners_from_params
    from pose2room_tpu.utils.vis import BOX_EDGES

    corners = box_corners_from_params(obb[0:3], obb[3:6], obb[6], xp=np)
    for a, b in BOX_EDGES:
        ax.plot(*zip(corners[a], corners[b]), color=color, linewidth=1.2)
    if label is not None:
        ax.text(*obb[0:3], label, fontsize=7, color=color)


def main():
    parser = argparse.ArgumentParser("Render dumped boxes to PNG.")
    parser.add_argument("dump_dir")
    parser.add_argument("--joints", default=None, help="optional (F,53,3) .npy clip")
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from pose2room_tpu.config.dataset_config import CLASS_LABELS

    fig = plt.figure(figsize=(10, 8))
    ax = fig.add_subplot(111, projection="3d")

    pred_files = sorted(glob.glob(os.path.join(args.dump_dir, "*pred_confident_nms_bbox.npz")))
    gt_files = sorted(glob.glob(os.path.join(args.dump_dir, "*gt_bbox.npz")))
    for path in pred_files:
        data = np.load(path)
        for obb, cls in zip(data["obbs"], data["cls"]):
            draw_box(ax, obb, "tab:red", CLASS_LABELS[int(cls)])
    for path in gt_files:
        data = np.load(path)
        for obb, cls in zip(data["obbs"], data["cls"]):
            draw_box(ax, obb, "tab:green")

    if args.joints:
        joints = np.load(args.joints)
        hips = joints[:, 0, :]
        ax.plot(hips[:, 0], hips[:, 1], hips[:, 2], color="tab:blue", linewidth=0.8)

    ax.set_title(f"pred (red) vs gt (green): {os.path.basename(args.dump_dir)}")
    ax.view_init(elev=35, azim=-60)
    out = args.out or os.path.join(args.dump_dir, "render.png")
    fig.savefig(out, dpi=130, bbox_inches="tight")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
