#!/usr/bin/env python
"""A/B the full generate path across model-config variants on the chip.

Interleaves the variants' timed runs in one process (machine drift cannot
bias the comparison) and checks output agreement before timing.  Used for
the block-sparse eval matmul decision (model.sparse_eval, VERDICT r3 #1)
and any future config-level A/B.

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_generate_ab.py \
        [--batch 128] [--dtype bfloat16] [--knob sparse_eval]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--knob", default="sparse_eval",
                    help="P2RNetConfig boolean field to A/B")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        platforms = jax.config.jax_platforms
        if platforms and "cpu" not in platforms.split(","):
            jax.config.update("jax_platforms", platforms + ",cpu")
    except Exception:
        pass

    from pose2room_tpu.models import P2RNet, P2RNetConfig
    from pose2room_tpu.models.p2rnet import P2RNet as P2R

    B = args.batch
    rng = np.random.RandomState(0)
    x = rng.randn(B, 768, 53, 3).astype(np.float32) * 0.5
    x[..., 0] += np.linspace(0, 3, 768)[None, :, None]
    dev = jax.devices()[0]
    x = jax.device_put(jnp.asarray(x), dev)
    key = jax.random.PRNGKey(0)

    runs = {}
    variables = None
    for knob_on in (False, True):
        model = P2RNet(config=P2RNetConfig(
            compute_dtype=args.dtype, **{args.knob: knob_on}
        ))
        if variables is None:
            # shared init (param trees are identical across the knob)
            x1 = np.zeros((1, 768, 53, 3), np.float32)
            if jax.default_backend() != "cpu":
                with jax.default_device(jax.devices("cpu")[0]):
                    variables = model.init(
                        {"params": key, "mdn": key}, x1, train=False
                    )
                variables = jax.device_put(variables, dev)
            else:
                variables = model.init({"params": key, "mdn": key}, x1, train=False)
        gen = jax.jit(
            lambda v, xx, m=model: m.apply(v, xx, method=P2R.generate)["center"]
        )
        # agreement gate on seed_features — UPSTREAM of the discrete
        # FPS/proposal reselection, which legitimately reorders proposals
        # under bf16 reassociation-level noise (same reasoning as bench.py's
        # eval selfcheck; box-level equivalence is the whole-system mAP A/B)
        bb = jax.jit(
            lambda v, xx, m=model: m.apply(
                v, xx, method=lambda mm, a: mm.backbone(a, train=False)
            )["seed_features"]
        )
        sf = np.asarray(bb(variables, x[:2]), np.float32)
        out = gen(variables, x)
        jax.block_until_ready(out)
        runs[knob_on] = {"gen": gen, "sf": sf, "times": []}
        print(f"{args.knob}={knob_on}: compiled", file=sys.stderr)

    d = np.abs(runs[True]["sf"] - runs[False]["sf"])
    scale = max(np.abs(runs[False]["sf"]).max(), 1e-6)
    print(f"seed_features agreement: max|diff| {d.max():.5f} (scale {scale:.3f})",
          file=sys.stderr)
    if d.max() > 0.05 * scale:
        print("BACKBONE MISMATCH — refusing to time", file=sys.stderr)
        sys.exit(1)

    for rep in range(3):
        for knob_on in (False, True):
            r = runs[knob_on]
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = r["gen"](variables, x)
            jax.block_until_ready(out)
            r["times"].append((time.perf_counter() - t0) / args.iters)

    print(f"batch={B}, dtype={args.dtype} (interleaved, min of 3 reps)")
    for knob_on in (False, True):
        dt = min(runs[knob_on]["times"])
        print(f"{args.knob}={knob_on}: {dt * 1e3:.2f} ms/batch "
              f"({B / dt:.1f} clips/s)")
    speedup = min(runs[False]["times"]) / min(runs[True]["times"])
    print(f"speedup ({args.knob} on/off): {speedup:.3f}x")


if __name__ == "__main__":
    main()
