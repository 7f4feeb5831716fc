#!/usr/bin/env python
"""Stage-3 CLI: VirtualHome recordings -> HDF5 training samples.

Reference counterpart: utils/virtualhome/3_generate_samples.py (requires the
stage-1/2 Unity outputs: recording/<scene>/<room>/<script>/<char>/.../
pd_script.txt plus script_bbox/<scene>/{room_bbox,bbox}_<room>.json).

Usage:
    python scripts/generate_samples.py --recordings <dir> --out <sample_dir>
        [--no-augment]
"""

import argparse


def main():
    parser = argparse.ArgumentParser("Generate HDF5 samples from recordings.")
    parser.add_argument("--recordings", required=True, help="recording root dir")
    parser.add_argument("--out", required=True, help="output samples dir")
    parser.add_argument("--no-augment", action="store_true")
    parser.add_argument("--workers", type=int, default=8)
    args = parser.parse_args()

    from pose2room_tpu.datagen import generate_samples

    written = generate_samples(
        args.recordings, args.out, augment=not args.no_augment, n_workers=args.workers
    )
    print(f"wrote {len(written)} samples to {args.out}")


if __name__ == "__main__":
    main()
