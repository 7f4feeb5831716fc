"""YAML config loading, recursive merge, run-dir + logging owner.

Capability parity with reference configs/config_utils.py:10-160 — same YAML
surface (``method/model/optimizer/scheduler/train/test/log`` sections), same
per-run save-dir layout ``<log.path>/<mode>/<ISO-timestamp>/`` with a
``log.txt`` file logger and an ``out_config.yaml`` snapshot.  I/O is gated on
process index 0 (the JAX analogue of the reference's main-process gating).
"""

import logging
import os
from datetime import datetime

import yaml


def read_to_dict(input_data):
    """Load a YAML path into a dict (passes dicts through unchanged)."""
    if isinstance(input_data, dict):
        return input_data
    if isinstance(input_data, (str, os.PathLike)) and os.path.isfile(input_data):
        with open(input_data, "r") as f:
            return yaml.safe_load(f)
    raise IOError(f"Cannot read config input: {input_data!r}")


def update_recursive(dict1, dict2):
    """Deep-merge dict2 into dict1 in place."""
    for k, v in dict2.items():
        if k not in dict1:
            dict1[k] = {} if isinstance(v, dict) else v
        if isinstance(v, dict):
            update_recursive(dict1[k], v)
        else:
            dict1[k] = v
    return dict1


def _is_main_process():
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


class CONFIG:
    """Owns the merged config dict, the per-run save path and the logger."""

    def __init__(self, args=None, config=None, make_dirs=True):
        self.config = config if config is not None else {}
        self._logger = None
        self.save_path = None
        self.is_main_process = _is_main_process()

        mode = None
        if args is not None:
            mode = getattr(args, "mode", None) or (
                args.get("mode") if isinstance(args, dict) else None
            )
        mode = mode or self.config.get("mode", "train")
        self.config["mode"] = mode

        root = self.config.get("log", {}).get("path", "out/p2rnet")
        stamp = datetime.now().isoformat().replace(":", "-")
        self.save_path = os.path.join(root, mode, stamp)
        if make_dirs and self.is_main_process:
            os.makedirs(self.save_path, exist_ok=True)
            vis_sub = self.config.get("log", {}).get("vis_path", "visualization")
            vis_path = os.path.join(self.save_path, vis_sub)
            os.makedirs(vis_path, exist_ok=True)
            self.config.setdefault("log", {})["vis_path"] = vis_path
        self._init_logger(make_dirs)

    def _init_logger(self, to_file):
        logger = logging.getLogger(f"p2r.{id(self)}")
        logger.setLevel(logging.INFO)
        logger.propagate = False
        stream = logging.StreamHandler()
        stream.setFormatter(logging.Formatter("%(message)s"))
        logger.addHandler(stream)
        if to_file and self.is_main_process and self.save_path:
            fh = logging.FileHandler(os.path.join(self.save_path, "log.txt"))
            fh.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
            logger.addHandler(fh)
        self._logger = logger

    def log_string(self, content):
        if self.is_main_process:
            self._logger.info(str(content))

    def update_config(self, *args, **kwargs):
        cfg1 = dict(kwargs)
        for item in args:
            cfg1.update(read_to_dict(item))
        update_recursive(self.config, cfg1)

    def write_config(self):
        if self.is_main_process and self.save_path:
            out = os.path.join(self.save_path, "out_config.yaml")
            with open(out, "w") as f:
                yaml.dump(self.config, f, default_flow_style=False)


def mount_external_config(cfg):
    """Attach DatasetConfig and (test/demo) the eval knob dict.

    Reference: configs/config_utils.py:140-160.
    """
    from pose2room_tpu.config.dataset_config import DatasetConfig

    dataset_config = DatasetConfig(
        cfg.config.get("data", {}).get("dataset", "virtualhome"),
        split=cfg.config.get("data", {}).get("split"),
    )
    cfg.dataset_config = dataset_config
    if cfg.config["mode"] in ("test", "demo"):
        test_cfg = cfg.config.get("test", {})
        cfg.eval_config = {
            "dataset_config": dataset_config,
            "remove_far_box": test_cfg.get("remove_far_box", True),
            "use_3d_nms": test_cfg.get("use_3d_nms", True),
            "nms_iou": test_cfg.get("nms_iou", 0.1),
            "use_old_type_nms": test_cfg.get("use_old_type_nms", False),
            "cls_nms": test_cfg.get("use_cls_nms", False),
            "per_class_proposal": test_cfg.get("per_class_proposal", True),
            "conf_thresh": test_cfg.get("conf_thresh", 0.05),
            "multi_mode": test_cfg.get("multi_mode", False),
            "sample_cls": test_cfg.get("sample_cls", False),
        }
    return cfg
