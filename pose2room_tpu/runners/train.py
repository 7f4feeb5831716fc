"""Train orchestrator (reference train.py:11-61 equivalent)."""

import jax

from pose2room_tpu.data import P2RNetDataset, DataLoader
from pose2room_tpu.runners.common import setup
from pose2room_tpu.train.engine import train as train_loop


def _make_loader(cfg, mode):
    data_cfg = cfg.config["data"]
    split_dir = data_cfg["split"]
    split_file = f"{split_dir}/{mode if mode != 'val' else 'val'}.json"
    ds = P2RNetDataset(
        split_file,
        num_frames=data_cfg.get("num_frames", 768),
        max_gt_boxes=data_cfg.get("max_gt_boxes", 10),
        augment=(mode == "train"),
        use_height=not data_cfg.get("no_height", True),
    )
    return DataLoader(
        ds,
        batch_size=cfg.config[mode]["batch_size"],
        shuffle=(mode == "train"),
        seed=cfg.config.get("seed", 42),
        num_workers=cfg.config.get("device", {}).get("num_workers", 8) or 0,
        worker_mode=cfg.config.get("device", {}).get("worker_mode", "thread"),
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )


def _check_split(cfg, name):
    import os

    split_file = os.path.join(cfg.config["data"]["split"], f"{name}.json")
    if not os.path.isfile(split_file):
        raise FileNotFoundError(
            f"Dataset split not found: {split_file}. Point data.split at a "
            "directory with train/val/test.json (see scripts/"
            "generate_samples.py + scripts/split_samples.py to build one "
            "from recordings, or pose2room_tpu.data.write_synthetic_dataset "
            "for a synthetic set)."
        )


def run(cfg):
    _check_split(cfg, "train")
    _check_split(cfg, "val")
    cfg.log_string("Setting up model and device mesh.")
    model, state, tx, opt_info, mesh, checkpoint, start_epoch, min_loss = setup(
        cfg, "train"
    )
    cfg.log_string(f"Mesh: {mesh}")
    cfg.log_string("Loading datasets.")
    train_loader = _make_loader(cfg, "train")
    val_loader = _make_loader(cfg, "val")
    cfg.log_string(
        f"{len(train_loader.dataset)} train / {len(val_loader.dataset)} val samples"
    )
    cfg.log_string("Starting training.")
    state = train_loop(
        cfg,
        model,
        state,
        tx,
        opt_info,
        train_loader,
        val_loader,
        checkpoint,
        mesh,
        start_epoch=start_epoch,
        min_loss=min_loss,
    )
    cfg.log_string("Training finished.")
    return state
