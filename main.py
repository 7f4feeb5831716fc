#!/usr/bin/env python
"""Pose2Room-TPU CLI: ``python main.py --config <yaml> --mode {train,test,demo}``.

Public-surface parity with the reference main.py:7-44 (same flags, same YAML
config format, same run-dir/log layout).
"""

import argparse
import os
import subprocess


def get_sha():
    """Git SHA/diff/branch stamp (reference net_utils/utils.py:471-488)."""
    cwd = os.path.dirname(os.path.abspath(__file__))

    def _run(cmd):
        try:
            return subprocess.check_output(cmd, cwd=cwd).decode("ascii").strip()
        except Exception:
            return "N/A"

    sha = _run(["git", "rev-parse", "HEAD"])
    diff = _run(["git", "diff-index", "HEAD"])
    branch = _run(["git", "rev-parse", "--abbrev-ref", "HEAD"])
    dirty = "has uncommitted changes" if diff else "clean"
    return f"sha: {sha}, status: {dirty}, branch: {branch}"


def parse_args():
    parser = argparse.ArgumentParser("Pose2Room-TPU.")
    parser.add_argument(
        "--config",
        type=str,
        default="configs/config_files/p2rnet_train.yaml",
        help="configure file for training or testing.",
    )
    parser.add_argument("--mode", type=str, default="train", help="train, test or demo.")
    parser.add_argument("--demo_path", type=str, default="demo", help="demo input path.")
    return parser.parse_args()


def main():
    args = parse_args()
    from pose2room_tpu.config import CONFIG, read_to_dict
    from pose2room_tpu.runners.common import initiate_environment

    config = read_to_dict(args.config)
    config = initiate_environment(config)

    cfg = CONFIG(args, config)
    cfg.update_config(args.__dict__)

    cfg.log_string("Loading configurations.")
    cfg.log_string(f"git:\n  {get_sha()}\n")
    cfg.log_string(cfg.config)
    cfg.write_config()

    if cfg.config["mode"] == "train":
        from pose2room_tpu.runners import train

        train.run(cfg)
    elif cfg.config["mode"] == "test":
        from pose2room_tpu.runners import test

        test.run(cfg)
    elif cfg.config["mode"] == "demo":
        from pose2room_tpu.runners import demo

        demo.run(cfg)
    else:
        raise ValueError(f"Unknown mode {cfg.config['mode']!r}")


if __name__ == "__main__":
    main()
