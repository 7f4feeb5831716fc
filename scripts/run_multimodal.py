#!/usr/bin/env python
"""Multi-mode (Bernoulli-sampled MDN) evaluation workflow, end-to-end.

Closes the reference workflow utils/eval/multi_modal_eval.py:36-101 ON THE
CHIP: train a model on a synthetic dataset, run N test passes with
``test.multi_mode: True`` (each pass draws its own ``n_samples`` and RNG
salt, exactly like re-invoking the reference's test.py N times), then
compute the element-wise max-mAP across runs plus the TMD diversity metric
via pose2room_tpu.eval.multi_modal.

Each stage is a subprocess of ``main.py`` — the real public surface — run
sequentially (never two TPU processes at once; remote compiles serialize).

Usage (TPU, from the repo root):
    PYTHONPATH=/root/.axon_site:/root/repo python scripts/run_multimodal.py \
        [--root /tmp/mm_eval] [--runs 3] [--epochs 30] [--skip-train]
"""

import argparse
import glob
import os
import subprocess
import sys
import time

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def newest_run_dir(base):
    dirs = sorted(glob.glob(os.path.join(base, "*")), key=os.path.getmtime)
    return dirs[-1] if dirs else None


def run_main(cfg_path, mode, env):
    cmd = [sys.executable, os.path.join(REPO, "main.py"),
           "--config", cfg_path, "--mode", mode]
    print(f"+ {' '.join(cmd)}", flush=True)
    t0 = time.time()
    rc = subprocess.call(cmd, cwd=REPO, env=env)
    print(f"  -> rc={rc} in {time.time() - t0:.0f}s", flush=True)
    if rc != 0:
        sys.exit(rc)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/mm_eval")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--n-train", type=int, default=120)
    ap.add_argument("--n-test", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse the newest existing checkpoint under --root")
    ap.add_argument("--platform", default="axon", choices=["axon", "cpu"],
                    help="cpu = strip the axon site from the subprocess "
                    "PYTHONPATH and force the CPU backend (plumbing smoke "
                    "without the chip; the official run uses the TPU)")
    args = ap.parse_args()

    from pose2room_tpu.data import write_synthetic_dataset

    split = os.path.join(args.root, "dataset", "splits", "script_level")
    if not os.path.isdir(split):
        write_synthetic_dataset(
            os.path.join(args.root, "dataset"),
            n_train=args.n_train, n_test=args.n_test, n_frames=900,
        )
        print(f"synthetic dataset at {split}", flush=True)

    with open(os.path.join(REPO, "configs/config_files/p2rnet_train.yaml")) as f:
        train_cfg = yaml.safe_load(f)
    train_cfg["data"]["split"] = split
    train_cfg["model"]["compute_dtype"] = args.dtype
    train_cfg["train"]["epochs"] = args.epochs
    train_cfg["scheduler"]["milestones"] = [max(args.epochs // 2, 1)]
    train_cfg["log"]["path"] = os.path.join(args.root, "out")
    train_cfg["device"]["num_workers"] = 2

    env = dict(os.environ)
    if args.platform == "cpu":
        env["PYTHONPATH"] = REPO
        env["JAX_PLATFORMS"] = "cpu"
    else:
        env["PYTHONPATH"] = "/root/.axon_site:" + REPO

    if not args.skip_train:
        cfg_path = os.path.join(args.root, "train.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(train_cfg, f)
        run_main(cfg_path, "train", env)
    ckpt_dir = newest_run_dir(os.path.join(args.root, "out", "train"))
    if ckpt_dir is None:
        sys.exit(f"no training run under {args.root}/out/train — "
                 "drop --skip-train or point --root at a trained root")
    ckpt = os.path.join(ckpt_dir, "model_best")
    if not os.path.isdir(ckpt):
        ckpt = os.path.join(ckpt_dir, "model_final")
    print(f"checkpoint: {ckpt}", flush=True)

    with open(os.path.join(REPO, "configs/config_files/p2rnet_test.yaml")) as f:
        test_cfg = yaml.safe_load(f)
    test_cfg["data"]["split"] = split
    test_cfg["model"]["compute_dtype"] = args.dtype
    test_cfg["finetune"] = True
    test_cfg["weight"] = [ckpt]
    test_cfg["test"]["multi_mode"] = True
    test_cfg["generation"]["dump_results"] = True
    # dump everything NMS kept: TMD needs per-instance boxes across runs and
    # an undertrained synthetic model rarely clears the reference's 0.5
    test_cfg["generation"]["dump_threshold"] = 0.05
    test_cfg["log"]["path"] = os.path.join(args.root, "out")
    test_cfg["device"]["num_workers"] = 2

    run_dirs = []
    for i in range(args.runs):
        cfg_path = os.path.join(args.root, f"test_mm_{i}.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(test_cfg, f)
        run_main(cfg_path, "test", env)
        run_dirs.append(newest_run_dir(os.path.join(args.root, "out", "test")))

    print("\nrun dirs:", run_dirs, flush=True)
    from pose2room_tpu.eval import multi_modal

    multi_modal.main(run_dirs)


if __name__ == "__main__":
    main()
