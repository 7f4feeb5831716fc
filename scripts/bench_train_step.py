#!/usr/bin/env python
"""A/B benchmark of the device train step: fused Pallas train chain vs module.

Measures the full-size flagship model's jitted train step (forward + loss +
backward + AdamW) at a given batch, with model.fused_train on and off, steps
INTERLEAVED in one process so machine drift cannot bias the comparison.
Numbers recorded in BENCH_NOTES.md ("fused ST-GCN train chain").

Usage: python scripts/bench_train_step.py [--batch 8] [--iters 20]
                                           [--trace /tmp/train_trace]

``--trace DIR`` additionally captures a jax.profiler device trace of 10
chained FUSED-path steps (feed DIR to scripts/xplane_op_profile.py for the
op-level attribution — BENCH_NOTES round-5 train attribution).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--trace", default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        platforms = jax.config.jax_platforms
        if platforms and "cpu" not in platforms.split(","):
            jax.config.update("jax_platforms", platforms + ",cpu")
    except Exception:
        pass

    from pose2room_tpu.models import P2RNet, P2RNetConfig
    from pose2room_tpu.train.state import create_train_state
    from pose2room_tpu.train.step import make_train_step

    B = args.batch
    rng = np.random.RandomState(0)
    batch_np = {
        "input_joints": rng.randn(B, 768, 53, 3).astype(np.float32) * 0.4,
        "center_label": rng.randn(B, 10, 3).astype(np.float32),
        "box_label_mask": (np.arange(10)[None] < 4)
        .astype(np.float32).repeat(B, 0),
        "size": rng.randn(B, 10, 3).astype(np.float32) * 0.2,
        "heading": rng.randn(B, 10, 2).astype(np.float32),
        "sem_cls_label": rng.randint(0, 22, (B, 10)).astype(np.int32),
        "vote_label": rng.randn(B, 768, 53, 9).astype(np.float32) * 0.1,
        "vote_label_mask": rng.randint(0, 2, (B, 768, 53)).astype(np.int32),
    }
    dev = jax.devices()[0]
    batch = {k: jax.device_put(jnp.asarray(v), dev) for k, v in batch_np.items()}
    key = jax.random.PRNGKey(0)

    runs = {}
    for fused in (False, True):
        model = P2RNet(
            config=P2RNetConfig(compute_dtype=args.dtype, fused_train=fused)
        )
        sample = np.zeros((B, 768, 53, 3), np.float32)
        state, tx, _ = create_train_state(model, key, sample, {"lr": 1e-3})
        state = jax.device_put(state, dev)
        step = make_train_step(model, tx)
        # train_step donates its state: keep our own handle chain
        state, losses = step(state, batch, key)  # compile + warmup
        jax.block_until_ready(losses["total"])
        runs[fused] = {
            "step": step, "state": state,
            "loss0": float(losses["total"]), "times": [],
        }
        print(f"fused_train={fused}: compiled, loss {runs[fused]['loss0']:.4f}",
              file=sys.stderr)

    # interleaved per-step timing (includes one host<->device round trip per
    # step — on this dev harness the chip sits behind a network tunnel, so
    # this OVERSTATES the step by ~20-25 ms of dispatch/sync latency)
    for it in range(args.iters):
        for fused in (False, True):
            r = runs[fused]
            t0 = time.perf_counter()
            r["state"], losses = r["step"](r["state"], batch, key)
            jax.block_until_ready(losses["total"])
            r["times"].append(time.perf_counter() - t0)

    # chained timing: dispatch all steps (state donation chains them on
    # device), sync once — amortizes the round trip and measures the actual
    # DEVICE step time, which is what the production loop (async dispatch +
    # one-step-late metric drain, train/engine.py) achieves
    for rep in range(3):
        for fused in (False, True):
            r = runs[fused]
            t0 = time.perf_counter()
            st = r["state"]
            for _ in range(args.iters):
                st, losses = r["step"](st, batch, key)
            jax.block_until_ready(losses["total"])
            r["state"] = st
            r.setdefault("chained", []).append(
                (time.perf_counter() - t0) / args.iters
            )

    print(f"batch={B}, dtype={args.dtype}, iters={args.iters} (interleaved)")
    for fused in (False, True):
        ts = np.array(runs[fused]["times"]) * 1e3
        ch = np.array(runs[fused]["chained"]) * 1e3
        print(
            f"fused_train={fused}: per-step median {np.median(ts):.2f} ms "
            f"(min {ts.min():.2f}); chained device step "
            f"{ch.min():.2f} ms; first-step loss {runs[fused]['loss0']:.4f}"
        )
    speedup = min(runs[False]["chained"]) / min(runs[True]["chained"])
    print(f"device-step speedup (module/fused): {speedup:.3f}x")

    if args.trace:
        r = runs[True]
        jax.profiler.start_trace(args.trace)
        st = r["state"]
        for _ in range(10):
            st, losses = r["step"](st, batch, key)
        jax.block_until_ready(losses["total"])
        jax.profiler.stop_trace()
        r["state"] = st
        print(f"fused-path trace written to {args.trace}")


if __name__ == "__main__":
    main()
