#!/usr/bin/env python
"""Measure the host data-loader ceiling: sustained samples/s vs workers.

Answers SCALING.md's feed question with numbers instead of assertion: how
many augmented production-shape samples/s can one host core deliver through
`P2RNetDataset.__getitem__` + `collate` (reference capability being matched:
the 12-worker torch DataLoader, models/p2rnet/dataloader.py:173-197 +
configs/config_files/p2rnet_train.yaml:9), and what global batch stays
device-bound at the measured train-step time.

The loader is a THREAD pool (HDF5 reads drop the GIL, the augment math is
numpy): scaling beyond one core's numpy throughput needs more cores, not
more threads, so the headline figure is samples/s/core and the chips-per
-host feasibility is derived, not asserted.  Run on any host:

    python scripts/bench_loader.py [--frames 2000] [--samples 64]

Writes one table (stderr prose + a final JSON line).
"""

import argparse
import json
import os
import sys
import tempfile
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2000,
                    help="raw frames per stored clip (subsampled to 768); "
                    "reference clips are 1-3k frames")
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--workers", default="0,2,4,8,16")
    ap.add_argument("--step-ms", type=float, default=30.9,
                    help="device train-step ms per batch-8 step "
                    "(BENCH_NOTES.md fused bf16 train)")
    args = ap.parse_args()

    from pose2room_tpu.data import write_synthetic_dataset
    from pose2room_tpu.data.dataset import P2RNetDataset
    from pose2room_tpu.data.loader import DataLoader

    ncores = os.cpu_count()
    with tempfile.TemporaryDirectory() as root:
        t0 = time.perf_counter()
        train_split, _ = write_synthetic_dataset(
            root, n_train=args.samples, n_test=1, n_frames=args.frames
        )
        print(
            f"dataset: {args.samples} clips x {args.frames} frames "
            f"({time.perf_counter() - t0:.1f}s to write), host cores: {ncores}",
            file=sys.stderr,
        )
        ds = P2RNetDataset(train_split, num_frames=768, augment=True)

        results = {}
        for nw in (int(w) for w in args.workers.split(",")):
            loader = DataLoader(
                ds, batch_size=args.batch, shuffle=True, num_workers=nw
            )
            # warm epoch (page cache), then timed epochs
            for _ in loader:
                pass
            n_epochs = 2
            t0 = time.perf_counter()
            nb = 0
            for _ in range(n_epochs):
                for batch in loader:
                    nb += batch["input_joints"].shape[0]
            dt = time.perf_counter() - t0
            sps = nb / dt
            results[nw] = sps
            print(
                f"num_workers={nw:3d}: {sps:8.1f} samples/s "
                f"({dt / nb * 1e3:.2f} ms/sample)",
                file=sys.stderr,
            )

        best = max(results.values())
        # feed requirement per chip at the measured device step
        need_per_chip = args.batch / (args.step_ms / 1e3)
        chips_per_core = best / need_per_chip
        print(
            f"\nfeed requirement: {need_per_chip:.0f} samples/s/chip at "
            f"{args.step_ms} ms per batch-{args.batch} train step;\n"
            f"this host sustains {best:.0f} samples/s on {ncores} core(s) "
            f"=> {best / ncores:.0f} samples/s/core "
            f"=> {chips_per_core * ncores:.1f} chips fed per {ncores}-core "
            f"host ({need_per_chip / (best / ncores):.1f} cores/chip)",
            file=sys.stderr,
        )
        print(json.dumps({
            "samples_per_sec": {str(k): round(v, 1) for k, v in results.items()},
            "cores": ncores,
            "samples_per_sec_per_core": round(best / ncores, 1),
            "cores_per_chip_at_step": round(need_per_chip / (best / ncores), 2),
        }))


if __name__ == "__main__":
    main()
