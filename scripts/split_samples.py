#!/usr/bin/env python
"""Stage-4 CLI: split HDF5 samples into train/val/test + avg-size prior.

Reference counterpart: utils/virtualhome/4_split_samples.py.

Usage:
    python scripts/split_samples.py --samples <dir> --out <split_root>
        [--level script_level|char_level|room_level] [--seed 2]
"""

import argparse
import glob
import os


def main():
    parser = argparse.ArgumentParser("Split samples.")
    parser.add_argument("--samples", required=True)
    parser.add_argument("--out", required=True, help="splits root dir")
    parser.add_argument(
        "--level",
        default="script_level",
        choices=["script_level", "char_level", "room_level"],
    )
    parser.add_argument("--seed", type=int, default=2)
    parser.add_argument("--keep-char", default=None,
                        help="room_level: keep only this character's samples")
    args = parser.parse_args()

    from pose2room_tpu.datagen import generate_splits, compute_avg_prior

    files = sorted(glob.glob(os.path.join(args.samples, "*.hdf5")))
    split_dir = os.path.join(args.out, args.level)
    split = generate_splits(
        files, split_dir, level=args.level, seed=args.seed, keep_char=args.keep_char
    )
    prior = compute_avg_prior(split["train"], split_dir)
    print(
        f"{args.level}: {len(split['train'])} train / {len(split['test'])} test; "
        f"prior classes: {len(prior['obj_size_cls_avg'])}"
    )


if __name__ == "__main__":
    main()
