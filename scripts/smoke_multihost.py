#!/usr/bin/env python
"""Real multi-process (multi-host) smoke: 2 processes x 4 virtual CPU devices.

Every multi-host code path in the framework — per-host loader shards,
``make_array_from_process_local_data`` global batch assembly, the jitted
train step's cross-process loss mean, ``allgather_object`` metric union
(APCalculator + LossRecorder) — is elsewhere exercised only under simulated
splits/injected fakes.  This smoke runs them for REAL: two OS processes
rendezvous through ``jax.distributed.initialize`` (localhost coordinator),
form one global 8-device mesh, run one sharded train step and a test-mode
metric merge, and process 0 writes the results for comparison against a
single-process run of the identical global computation
(tests/test_multihost.py asserts equality).

Reference capability being reproduced: torch.distributed env:// rendezvous +
NCCL metric all-reduce (net_utils/utils.py:423-449, :319-327).

Usage (normally driven by tests/test_multihost.py):
  # single-process reference result
  python scripts/smoke_multihost.py --out ref.json
  # one worker of a 2-process run
  python scripts/smoke_multihost.py --coordinator localhost:PORT \
      --num-processes 2 --process-id 0 --out p0.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOCAL_DEVICES = 4


def build_global_batch(cfg, n_global):
    """Deterministic global batch — every process derives the same arrays."""
    import numpy as np

    rng = np.random.RandomState(7)
    B, T = n_global, cfg.num_frames
    return {
        "input_joints": rng.randn(B, T, 53, 3).astype(np.float32) * 0.4,
        "center_label": rng.randn(B, 10, 3).astype(np.float32),
        "box_label_mask": (np.arange(10)[None] < 3).astype(np.float32).repeat(B, 0),
        "size": rng.randn(B, 10, 3).astype(np.float32) * 0.2,
        "heading": rng.randn(B, 10, 2).astype(np.float32),
        "sem_cls_label": rng.randint(0, 22, (B, 10)).astype(np.int32),
        "vote_label": rng.randn(B, T, 53, 9).astype(np.float32) * 0.1,
        "vote_label_mask": rng.randint(0, 2, (B, T, 53)).astype(np.int32),
    }


def synthetic_scan(scan_id):
    """Deterministic per-scan pred/gt lists for the AP-merge check."""
    import numpy as np

    rng = np.random.RandomState(100 + scan_id)

    def box(center, size):
        dx, dy, dz = size / 2.0
        corners = np.array(
            [[sx * dx, sy * dy, sz * dz]
             for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
            dtype=np.float64,
        )
        return corners + center

    gt, pred = [], []
    for j in range(3):
        cls = int(rng.randint(0, 4))
        center = rng.randn(3) * 2.0
        size = 0.5 + rng.rand(3)
        gt.append((cls, box(center, size)))
        # jittered detection + one confident false positive per scan
        pred.append((cls, box(center + rng.randn(3) * 0.05, size),
                     float(0.5 + 0.5 * rng.rand())))
    pred.append((int(rng.randint(0, 4)), box(rng.randn(3) * 4.0,
                 0.5 + rng.rand(3)), 0.9))
    return pred, gt


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--coordinator", default=None,
                        help="host:port; omit for the single-process reference")
    parser.add_argument("--num-processes", type=int, default=1)
    parser.add_argument("--process-id", type=int, default=0)
    parser.add_argument("--out", required=True)
    parser.add_argument(
        "--local-devices", type=int, default=LOCAL_DEVICES,
        help="virtual CPU devices in THIS process (the single-process "
        "reference passes 8 so the global mesh/batch match the 2x4 run)",
    )
    args = parser.parse_args()

    total_devices = args.local_devices * args.num_processes
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.coordinator:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    assert jax.process_count() == args.num_processes
    assert jax.device_count() == total_devices, (
        jax.device_count(), total_devices,
    )

    import numpy as np

    from pose2room_tpu.models import P2RNet, P2RNetConfig
    from pose2room_tpu.parallel import make_mesh, shard_batch, replicate
    from pose2room_tpu.train.state import create_train_state
    from pose2room_tpu.train.step import make_train_step
    from pose2room_tpu.eval.ap import APCalculator
    from pose2room_tpu.utils.logger import LossRecorder

    cfg = P2RNetConfig(
        num_frames=64, num_seeds=32, num_proposals=8, num_gaussian=8
    )
    model = P2RNet(config=cfg)
    key = jax.random.PRNGKey(0)
    mesh = make_mesh()  # all global devices, 1-D 'data' axis

    n_global = total_devices  # one sample per device
    global_batch = build_global_batch(cfg, n_global)
    # per-host shard: CONTIGUOUS blocks, so make_array_from_process_local_data
    # (which fills the global array in process order) reassembles exactly the
    # single-process batch.  An interleaved shard would be an equally valid
    # data-parallel split but permutes the batch, and the train forward draws
    # MDN sampling noise by batch position — the loss would then differ from
    # the single-process run for rng reasons, not correctness ones.
    per = n_global // args.num_processes
    lo = args.process_id * per
    local = {
        k: np.ascontiguousarray(v[lo : lo + per])
        for k, v in global_batch.items()
    }

    sample = np.zeros(
        (n_global, cfg.num_frames, cfg.num_joints, 3), dtype=np.float32
    )
    state, tx, _ = create_train_state(model, key, sample, {"lr": 1e-3})
    state = replicate(state, mesh)
    batch = shard_batch(local if args.coordinator else global_batch, mesh)
    train_step = make_train_step(model, tx)
    new_state, losses = train_step(state, batch, key)
    jax.block_until_ready(new_state.params)
    losses = {k: float(v) for k, v in losses.items()}

    # NOTE on shard semantics: the host shard above is CONTIGUOUS
    # (process p holds rows [p*per, (p+1)*per)), so the reassembled global
    # array has exactly global_batch's row order — the loss comparison below
    # is a like-for-like check, not a permutation-invariance argument (the
    # train forward draws MDN noise by batch position, so row order matters).

    # --- test-mode metric union (allgather_object over process_allgather) ---
    n_scans = 6
    calc = APCalculator(0.25, None)
    recorder = LossRecorder(batch_size=1)
    my_scans = (
        range(args.process_id, n_scans, args.num_processes)
        if args.coordinator
        else range(n_scans)
    )
    for s in my_scans:
        pred, gt = synthetic_scan(s)
        calc.step([pred], [gt])
        recorder.update_loss({"total": float(s), "aux": float(s) * 0.5})
    calc.synchronize_between_processes()
    recorder.synchronize_between_processes()
    metrics = calc.compute_metrics()

    result = {
        "losses": losses,
        "mAP": float(metrics["mAP"]),
        "AR": float(metrics["AR"]),
        "recorder_means": {k: float(v) for k, v in recorder.means().items()},
        "process_count": jax.process_count(),
        "device_count": jax.device_count(),
    }
    if args.process_id == 0:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    print(f"process {args.process_id}: OK {result}", file=sys.stderr)


if __name__ == "__main__":
    main()
