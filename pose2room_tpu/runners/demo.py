"""Demo orchestrator: raw .npy pose clip -> predicted boxes (reference demo.py).

Headless: predictions are dumped as .npz / .json / .ply (see utils/vis.py)
instead of opening a VTK window; the file formats match the reference's dump
path so its viewers can render them.
"""

import glob
import os

import numpy as np
from jax.tree_util import tree_leaves as jax_tree_leaves

from pose2room_tpu.data.dataset import load_demo_clip
from pose2room_tpu.eval import parse_predictions, assembly_pred_map_cls
from pose2room_tpu.runners.common import setup
from pose2room_tpu.train.step import make_fold_fn, make_generate_fn
from pose2room_tpu.utils.vis import dump_predictions, write_ply_boxes, write_ply_points


def run(cfg):
    # resolve inputs BEFORE setup(): weight restore + device init cost
    # minutes on a remote-compile backend and are wasted on an empty dir
    demo_path = cfg.config.get("demo_path", "demo")
    inputs = sorted(glob.glob(os.path.join(demo_path, "inputs", "*.npy")))
    if not inputs:
        inputs = sorted(glob.glob(os.path.join(demo_path, "*.npy")))
    if not inputs:
        cfg.log_string(f"No demo .npy inputs under {demo_path}")
        return []
    model, state, _, _, mesh, _, _, _ = setup(cfg, "demo")

    data_cfg = cfg.config["data"]
    # fold the graph matrices once and BAKE them into the executable as
    # constants — demo is the batch-1 latency path, where the inline re-fold
    # would be 39% of the device step and the baked form buys another 2.8%
    # via cross-program prefetch (BENCH_NOTES.md rounds 4-5); demo jits once
    # per weight load, so the bake_folded staleness contract is trivially met.
    # The bake inflates the serialized HLO by the folded operand bytes
    # (~143 MB bf16 / ~286 MB f32): environments that ship programs to a
    # remote compile service can reject it (observed: axon tunnel HTTP 413
    # on the f32 form), so the first clip runs under a fallback to the
    # runtime-arg fold — same math (tests/test_fold_eval.py), no constants.
    folded = make_fold_fn(model)(state)
    # demo.bake_folded: true / false / "auto" (default).  Auto skips the
    # bake when the folded operands alone exceed ~200 MB serialized HLO —
    # the f32 form (~286 MB) was OBSERVED to be rejected by the remote
    # compile service (HTTP 413), so attempting it would just pay a
    # multi-minute failed upload before the fallback; the bf16 form
    # (~143 MB) fits and is the benchmarked serving config.
    bake_cfg = cfg.config.get("demo", {}).get("bake_folded", "auto")
    if folded and bake_cfg == "auto":
        folded_bytes = sum(
            np.prod(a.shape) * a.dtype.itemsize
            for a in jax_tree_leaves(folded)
        )
        bake_cfg = folded_bytes < 200 * 2**20
        if not bake_cfg:
            cfg.log_string(
                f"folded operands {folded_bytes / 2**20:.0f} MB >= 200 MB: "
                "skipping the baked-constants form (known remote-compile "
                "rejection size); using the runtime-arg fold"
            )
    baked = (
        make_generate_fn(model, bake_folded=folded)
        if folded and bake_cfg else None
    )
    runtime_arg = None  # built lazily on fallback

    def run_generate(joints):
        nonlocal baked, runtime_arg
        if baked is not None:
            try:
                return baked(state, joints)
            except Exception as err:  # compile-time rejection of the bake
                cfg.log_string(
                    f"baked-constants generate failed to compile ({err}); "
                    "falling back to the runtime-arg folded form"
                )
                baked = None
        if runtime_arg is None:
            runtime_arg = make_generate_fn(model)
        return runtime_arg(state, joints, folded=folded)

    results = []
    for path in inputs:
        joints = load_demo_clip(
            path,
            num_frames=data_cfg.get("num_frames", 768),
            use_height=not data_cfg.get("no_height", True),
        )[None]  # (1,T,V,3)
        end_points = run_generate(joints)
        eval_dict, parsed = parse_predictions(
            end_points, {"input_joints": joints}, cfg.eval_config
        )
        eval_dict = assembly_pred_map_cls(eval_dict, parsed, cfg.eval_config)

        name = os.path.splitext(os.path.basename(path))[0]
        dump_dir = os.path.join(cfg.config["log"]["vis_path"], f"demo_{name}")
        dump_threshold = cfg.config.get("generation", {}).get("dump_threshold", 0.5)
        dump_predictions(
            dump_dir, end_points, eval_dict, parsed, dump_threshold=dump_threshold
        )
        # headless visualization artifacts
        npz = os.path.join(dump_dir, "000000_pred_confident_nms_bbox.npz")
        if os.path.isfile(npz):
            data = np.load(npz)
            write_ply_boxes(data["obbs"], os.path.join(dump_dir, "pred_boxes.ply"))
        write_ply_points(
            joints[0, :: max(1, joints.shape[1] // 64)].reshape(-1, 3),
            os.path.join(dump_dir, "skeleton_points.ply"),
        )
        n_boxes = int(
            np.logical_and(
                parsed["obj_prob"][0] > dump_threshold, eval_dict["pred_mask"][0] == 1
            ).sum()
        )
        cfg.log_string(f"{path}: {n_boxes} confident boxes -> {dump_dir}")
        results.append((path, dump_dir, n_boxes))
    return results
