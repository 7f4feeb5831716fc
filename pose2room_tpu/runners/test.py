"""Test orchestrator: mAP evaluation (reference test.py + test_epoch.py)."""

import os
import time

import jax
import numpy as np

from pose2room_tpu.data import P2RNetDataset, DataLoader
from pose2room_tpu.eval import (
    APCalculator,
    parse_predictions,
    parse_predictions_device,
    parse_groundtruths,
    parse_groundtruths_device,
    assembly_pred_map_cls,
    assembly_gt_map_cls,
)
from pose2room_tpu.models.loss import detection_loss
from pose2room_tpu.runners.common import setup
from pose2room_tpu.train.step import make_fold_fn, make_generate_fn
from pose2room_tpu.utils.logger import LossRecorder
from pose2room_tpu.utils.vis import dump_predictions


def resolve_test_batch_size(value):
    """'auto' scales the eval batch with the mesh so multi-chip test runs
    shard usefully out of the box (SCALING.md: eval only speeds up when
    test.batch_size >= n_devices); literal 1 stays the reference-parity
    default (reference p2rnet_test.yaml:36)."""
    if value == "auto":
        return max(jax.local_device_count(), 1)
    return int(value)


def run(cfg):
    from pose2room_tpu.runners.train import _check_split

    _check_split(cfg, "test")
    model, state, _, _, mesh, _, _, _ = setup(cfg, "test")
    data_cfg = cfg.config["data"]
    split_file = os.path.join(data_cfg["split"], "test.json")
    ds = P2RNetDataset(
        split_file,
        num_frames=data_cfg.get("num_frames", 768),
        max_gt_boxes=data_cfg.get("max_gt_boxes", 10),
        augment=False,
        use_height=not data_cfg.get("no_height", True),
    )
    batch_size = resolve_test_batch_size(cfg.config["test"].get("batch_size", 1))
    if cfg.config["test"].get("batch_size") == "auto":
        cfg.log_string(f"test.batch_size: auto -> {batch_size}")
    loader = DataLoader(
        ds,
        batch_size=batch_size,
        shuffle=False,
        num_workers=cfg.config.get("device", {}).get("num_workers", 8) or 0,
        worker_mode=cfg.config.get("device", {}).get("worker_mode", "thread"),
        # per-host shard of the test set; AP/loss state is re-unioned across
        # processes below (synchronize_between_processes)
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    cfg.log_string(f"{len(ds)} test samples")

    multi_mode = cfg.config["test"].get("multi_mode", False)
    # Per-RUN entropy for multi-modal evaluation: multi_modal_eval aggregates
    # over several SAMPLED runs, so each run must draw different modes while
    # staying reproducible within itself — fold the run dir's identity into
    # the key via a stable hash (Python hash() is randomized per process by
    # PYTHONHASHSEED, which would make re-evaluating the same run dir
    # irreproducible).
    import zlib

    run_salt = zlib.crc32(cfg.save_path.encode()) & 0x7FFFFFFF if multi_mode else 0
    rng_host = np.random.RandomState(
        (cfg.config.get("seed", 42) + run_salt) % (2**31)
    )
    # reference picks a random sample count in [1, 99] per run
    # (proposal_net.py:58-59)
    n_samples = int(rng_host.choice(np.arange(1, 100))) if multi_mode else 1
    if multi_mode:
        # Persist the drawn mode parameters so the run is auditable and
        # replayable from its out_config.yaml.
        cfg.config["test"]["drawn_run_salt"] = int(run_salt)
        cfg.config["test"]["drawn_n_samples"] = n_samples
        cfg.write_config()
    generate = make_generate_fn(model, multi_mode=multi_mode, n_samples=n_samples)
    # weight-only graph-matrix fold, once per run (see make_fold_fn): the
    # per-batch generate then skips ~0.54 ms/step of device-time re-folding
    folded = make_fold_fn(model)(state)
    origin = cfg.dataset_config.origin_joint_id
    jitted_loss = jax.jit(
        lambda end_points, gt: detection_loss(end_points, gt, origin)
    )
    gen_key = jax.random.fold_in(
        jax.random.fold_in(
            jax.random.PRNGKey(cfg.config.get("seed", 42)), run_salt
        ),
        jax.process_index(),
    )
    thresholds = cfg.config["test"].get("ap_iou_thresholds", [0.25, 0.5])
    ap_calculators = {
        t: APCalculator(t, cfg.dataset_config.class2type) for t in thresholds
    }
    # Voxel-occupancy ("mesh") AP variant (reference ap_helper.py:84-125):
    # rasterize every pred/GT box on the global voxel lattice and report
    # `_mesh`-suffixed metrics alongside box AP.
    eval_mesh_ap = cfg.config["test"].get("eval_mesh_ap", False)
    mesh_voxel_size = cfg.config["test"].get("mesh_voxel_size", 0.0625)
    if eval_mesh_ap:
        from pose2room_tpu.eval.voxels import voxelize_box

        def attach_voxels(pred_map, gt_map):
            """Augment assembled scan lists with (internal, surface)
            occupancies.  per_class_proposal expands each proposal into one
            entry per class with the SAME corners — dedupe the rasterization
            by box bytes so each box voxelizes once."""
            cache = {}

            def vox(box):
                box = np.asarray(box, dtype=np.float64)
                key = box.tobytes()
                if key not in cache:
                    cache[key] = voxelize_box(box, mesh_voxel_size)
                return cache[key]

            pred_out = [
                [(c, b, s, vox(b)) for (c, b, s) in scan] for scan in pred_map
            ]
            gt_out = [[(c, b, vox(b)) for (c, b) in scan] for scan in gt_map]
            return pred_out, gt_out

    recorder = LossRecorder(loader.batch_size)
    dump = cfg.config.get("generation", {}).get("dump_results", False)
    dump_threshold = cfg.config.get("generation", {}).get("dump_threshold", 0.5)

    start = time.time()
    n_batches = len(loader)

    # In the pipelined loop a batch's work (device compute of batch k,
    # host post-processing of batch k-1, load of batch k+1) overlaps, so
    # the honest per-batch number is the time between successive batch
    # COMPLETIONS — dispatch-to-fetch spans would double-count overlapped
    # work and sum past the total.
    last_done = [start]

    def host_stage(item):
        """Fetch + NMS + AP accumulation for an already-dispatched batch.

        Runs while the NEXT batch's generate/parse/loss execute on device
        (all dispatches are async), so host post-processing overlaps device
        compute — a software pipeline the reference's serial per-batch loop
        (test_epoch.py) leaves on the table.
        """
        it, batch, arrays, end_points, dev_parse, dev_gt, losses = item
        eval_dict, parsed = parse_predictions(
            end_points, arrays, cfg.eval_config, _device_out=dev_parse
        )
        eval_dict = assembly_pred_map_cls(eval_dict, parsed, cfg.eval_config)
        parsed_gts = parse_groundtruths(arrays, _device_out=dev_gt)
        gt_map = assembly_gt_map_cls(parsed_gts)
        recorder.update_loss(
            {k: float(v) for k, v in jax.device_get(losses).items()}
        )
        pred_map = eval_dict["batch_pred_map_cls"]
        if eval_mesh_ap:
            pred_map, gt_map = attach_voxels(pred_map, gt_map)
        for t in thresholds:
            ap_calculators[t].step(pred_map, gt_map)
        now = time.time()
        cfg.log_string(
            f"Test batch {it + 1}/{n_batches}: {now - last_done[0]:.3f}s"
        )
        last_done[0] = now
        if dump and cfg.is_main_process:
            dump_dir = os.path.join(
                cfg.config["log"]["vis_path"],
                f"test_{it}_{batch['sample_idx'][0]}",
            )
            dump_predictions(
                dump_dir, end_points, eval_dict, parsed,
                gt_data=arrays, dump_threshold=dump_threshold,
            )

    from pose2room_tpu.parallel import shard_batch

    # Single-host: shard the eval batch over the mesh's data axis so
    # generate/parse/loss scale across every chip, mirroring the train step
    # (a plain jit over host numpy would run the whole batch on one
    # device); trailing partial batches fall back to replication inside
    # shard_batch.  Multi-host keeps host-local numpy — eval parallelism
    # there comes from the per-host scan shard, and the host-side AP stage
    # must be able to fetch its arrays (a globally-sharded array is not
    # addressable from one process).
    single_host = jax.process_count() == 1

    pending = None
    for it, batch in enumerate(loader):
        arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        if single_host:
            arrays = shard_batch(arrays, mesh)
        end_points = generate(
            state, arrays["input_joints"], jax.random.fold_in(gen_key, it),
            folded=folded,
        )
        dev_parse = parse_predictions_device(end_points, arrays, cfg.eval_config)
        dev_gt = parse_groundtruths_device(arrays)
        losses = jitted_loss(
            {k: v for k, v in end_points.items() if k != "pi"},
            {
                k: arrays[k]
                for k in (
                    "center_label", "box_label_mask", "size", "heading",
                    "sem_cls_label", "vote_label", "vote_label_mask",
                )
            },
        )
        item = (it, batch, arrays, end_points, dev_parse, dev_gt, losses)
        if pending is not None:
            host_stage(pending)
        pending = item
    if pending is not None:
        host_stage(pending)

    cfg.log_string(f"Test total elapsed: {time.time() - start:.2f}s")
    # multi-host: union shard-local AP state and loss counters so the
    # reported metrics are global (reference net_utils/utils.py:319-327)
    recorder.synchronize_between_processes()
    for calc in ap_calculators.values():
        calc.synchronize_between_processes()
    cfg.log_string(f"Mean losses: {recorder.means()}")
    metrics_all = {}
    for t, calc in ap_calculators.items():
        cfg.log_string(f"---------- iou_thresh: {t} ----------")
        metrics = (
            calc.compute_metrics_w_mesh() if eval_mesh_ap
            else calc.compute_metrics()
        )
        for k, v in metrics.items():
            cfg.log_string(f"eval {k}: {v}")
        metrics_all[t] = metrics
    return metrics_all
