#!/usr/bin/env python
"""Batch-1 (demo-latency) generate profile: piecewise timing + device trace.

VERDICT r3 #5: at batch 1 the measured 2.4-2.9 ms/clip is dominated by the
vote/proposal/FPS/parse tail and per-kernel fixed overheads rather than the
compute-bound 0.82 ms/clip the batch-128 sweep achieves.  This script
attributes the batch-1 step piecewise (stage subsets re-jitted standalone)
and optionally captures a TensorBoard trace for op-level dispatch counts.

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo python scripts/prof_batch1.py \
        [--batch 1] [--dtype bfloat16] [--trace /tmp/b1_trace]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--trace", default=None)
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

    model = P2RNet(config=P2RNetConfig(compute_dtype=args.dtype))
    key = jax.random.PRNGKey(0)
    x1 = np.zeros((1, 768, 53, 3), np.float32)
    if jax.default_backend() != "cpu":
        with jax.default_device(jax.devices("cpu")[0]):
            variables = model.init({"params": key, "mdn": key}, x1, train=False)
        variables = jax.device_put(variables, jax.devices()[0])
    else:
        variables = model.init({"params": key, "mdn": key}, x1, train=False)

    B = args.batch
    rng = np.random.RandomState(0)
    x = rng.randn(B, 768, 53, 3).astype(np.float32) * 0.5
    x[..., 0] += np.linspace(0, 3, 768)[None, :, None]
    x = jax.device_put(jnp.asarray(x), jax.devices()[0])

    def timeit(name, fn, *fargs, iters=args.iters):
        out = fn(*fargs)
        jax.block_until_ready(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*fargs)
            jax.block_until_ready(out)
            ts.append((time.perf_counter() - t0) / iters)
        dt = min(ts)
        print(
            f"{name:38s}: {dt * 1e3:7.3f} ms/batch "
            f"({dt * 1e3 / B:7.3f} ms/clip)",
            flush=True,
        )
        return dt

    stages = {}
    stages["full generate"] = timeit(
        "full generate",
        jax.jit(lambda v, xx: model.apply(v, xx, method=P2R.generate)["center"]),
        variables, x,
    )
    # serving configuration: graph matrices folded once per weight load
    # (the inline fold above re-folds per call — ~0.54 ms/step device time)
    folded = jax.jit(lambda v: model.apply(v, method=P2R.fold_eval))(variables)
    folded = folded or None
    stages["full generate (pre-folded)"] = timeit(
        "full generate (pre-folded)",
        jax.jit(
            lambda v, xx, f: model.apply(
                v, xx, folded=f, method=P2R.generate
            )["center"]
        ),
        variables, x, folded,
    )
    # same fold, but closure-captured at trace time: XLA embeds the folded
    # matrices as executable CONSTANTS (enables cross-program prefetch /
    # different memory-space assignment than runtime args).  Serving can
    # afford this form — it just means re-jitting generate per weight load.
    stages["full generate (folded constants)"] = timeit(
        "full generate (folded constants)",
        jax.jit(
            lambda v, xx: model.apply(
                v, xx, folded=folded, method=P2R.generate
            )["center"]
        ),
        variables, x,
    )
    stages["backbone (ST-GCN)"] = timeit(
        "backbone (ST-GCN)",
        jax.jit(
            lambda v, xx: model.apply(
                v, xx, method=lambda m, a: m.backbone(a, train=False)
            )["seed_features"]
        ),
        variables, x,
    )

    # trunk = backbone + centervoting + normalize (the proposal/MDN decode
    # tail is then full - trunk)
    stages["trunk (backbone+vote+norm)"] = timeit(
        "trunk (backbone+vote+norm)",
        jax.jit(
            lambda v, xx: model.apply(
                v, xx, method=lambda m, a: m._trunk(a, False)
            )[2]
        ),
        variables, x,
    )

    tail = stages["full generate"] - stages["trunk (backbone+vote+norm)"]
    print(
        f"-> proposal+MDN decode tail: {tail * 1e3:.3f} ms/batch; "
        f"backbone share {stages['backbone (ST-GCN)'] / stages['full generate']:.1%}"
    )

    if args.trace:
        # trace the serving (pre-folded) path
        gen = jax.jit(
            lambda v, xx, f=folded: model.apply(
                v, xx, folded=f, method=P2R.generate
            )["center"]
        )
        out = gen(variables, x)
        jax.block_until_ready(out)
        jax.profiler.start_trace(args.trace)
        for _ in range(10):
            out = gen(variables, x)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
