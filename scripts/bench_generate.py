#!/usr/bin/env python
"""A/B benchmark of the P2RNet generate path: fused ST-GCN chain vs module path.

Measures the full-size flagship model on the attached chip at a given batch,
with the fused merged-layout eval chain (ops/stgcn_fused.py, the bf16
default) against the per-block module path, and reports the max |diff| of
the predicted centers.  Numbers for v5e are recorded in BENCH_NOTES.md
("fused ST-GCN eval chain").

Usage: python scripts/bench_generate.py [--batch 128] [--iters 30]
"""

import argparse
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument("--dtype", default="bfloat16")
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

    B = args.batch
    rng = np.random.RandomState(0)
    x = rng.randn(B, 768, 53, 3).astype(np.float32) * 0.5
    x[..., 0] += np.linspace(0, 3, 768)[None, :, None]

    results = {}
    for fused in (True, False):
        model = P2RNet(
            config=P2RNetConfig(compute_dtype=args.dtype, fused_eval=fused)
        )
        key = jax.random.PRNGKey(0)
        init_x = np.zeros((1, 768, 53, 3), np.float32)
        if jax.default_backend() != "cpu":
            with jax.default_device(jax.devices("cpu")[0]):
                variables = model.init(
                    {"params": key, "mdn": key}, init_x, train=False
                )
            variables = jax.device_put(variables, jax.devices()[0])
        else:
            variables = model.init(
                {"params": key, "mdn": key}, init_x, train=False
            )
        xd = jax.device_put(jnp.asarray(x), jax.devices()[0])
        gen = jax.jit(
            lambda v, xx: model.apply(v, xx, method=P2RNet.generate)["center"]
        )
        out = gen(variables, xd)
        jax.block_until_ready(out)
        results[fused] = np.asarray(out, np.float32)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = gen(variables, xd)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(
            f"fused_eval={fused}: {dt * 1e3:.2f} ms/batch "
            f"({B / dt:.0f} clips/s)"
        )

    d = np.abs(results[True] - results[False])
    # bf16 rounding differences cascade through discrete FPS reselection, so
    # per-proposal centers can differ on a random-init model; the metric
    # parity check is test-mode mAP on a trained checkpoint (BENCH_NOTES.md)
    print(f"center |diff| fused vs module: max {d.max():.4f} mean {d.mean():.4f}")


if __name__ == "__main__":
    main()
