#!/usr/bin/env python
"""Benchmark: P2RNet inference throughput (pose clips/sec/chip).

Runs the full-size flagship model (768 frames x 53 joints -> 512 seeds ->
128 proposals, 22 classes) in deterministic generate mode, sweeps batch
sizes, and reports the best clips/sec on the attached chip.

Baseline (``vs_baseline``): the reference PyTorch implementation cannot run
its inference on CPU at all (pointnet2 CUDA ops assert on CPU,
_ext-src/src/sampling.cpp:34); the recorded reference-CPU baseline is the
torch-CPU port measured by scripts/measure_torch_baseline.py (see
BENCH_NOTES.md) — reference-equivalent model, CPU-native pointnet2
replacements, same shapes.
"""

import json
import time

import numpy as np

# measured by scripts/measure_torch_baseline.py (torch CPU, batch-1..8 sweep)
TORCH_CPU_CLIPS_PER_SEC = None  # filled from BENCH_NOTES.md if measured
try:
    import os, re

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_NOTES.md")) as f:
        m = re.search(r"torch_cpu_clips_per_sec:\s*([0-9.]+)", f.read())
        if m:
            TORCH_CPU_CLIPS_PER_SEC = float(m.group(1))
except Exception:
    pass


def main():
    import argparse
    import jax

    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--dtype", default="bfloat16", choices=["float32", "bfloat16"],
        help="compute dtype; bf16 is the official bench config (accuracy "
        "budget quantified in BENCH_NOTES.md)",
    )
    # default sweep skips 8/64: each extra batch size costs a full remote
    # compile (~1-3 min through the dev tunnel) and 128 wins (BENCH_NOTES.md)
    parser.add_argument("--batches", default="1,32,128")
    args = parser.parse_args()

    try:
        platforms = jax.config.jax_platforms
        if platforms and "cpu" not in platforms.split(","):
            jax.config.update("jax_platforms", platforms + ",cpu")
    except Exception:
        pass

    from pose2room_tpu.models import P2RNet, P2RNetConfig

    model = P2RNet(config=P2RNetConfig(compute_dtype=args.dtype))
    key = jax.random.PRNGKey(0)
    init_x = np.zeros((1, 768, 53, 3), dtype=np.float32)
    # init eagerly on CPU (remote-compile paths make on-device init minutes slow)
    init_dev = None
    if jax.default_backend() != "cpu":
        try:
            init_dev = jax.devices("cpu")[0]
        except RuntimeError:
            init_dev = None
    if init_dev is not None:
        with jax.default_device(init_dev):
            variables = model.init({"params": key, "mdn": key}, init_x, train=False)
        variables = jax.device_put(variables, jax.devices()[0])
    else:
        variables = model.init({"params": key, "mdn": key}, init_x, train=False)

    @jax.jit
    def generate(variables, x):
        out = model.apply(variables, x, method=P2RNet.generate)
        return (
            out["center"], out["size"], out["heading"],
            out["objectness_scores"], out["sem_cls_scores"],
        )

    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    best = 0.0
    best_batch = 1
    for batch in (int(b) for b in args.batches.split(",")):
        x = rng.randn(batch, 768, 53, 3).astype(np.float32) * 0.5
        x[..., 0] += np.linspace(0, 3, 768)[None, :, None]
        # pre-stage on device: measures chip throughput; a production input
        # pipeline overlaps H2D with compute (and this dev harness reaches
        # the chip through a network tunnel, so per-call H2D is not
        # representative of a real TPU host)
        x = jax.device_put(jnp.asarray(x), jax.devices()[0])
        out = generate(variables, x)
        jax.block_until_ready(out)
        n_iter = 30
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = generate(variables, x)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        clips_per_sec = batch * n_iter / dt
        if clips_per_sec > best:
            best = clips_per_sec
            best_batch = batch

    vs_baseline = best / TORCH_CPU_CLIPS_PER_SEC if TORCH_CPU_CLIPS_PER_SEC else None
    print(
        json.dumps(
            {
                "metric": (
                    f"pose clips/sec/chip (P2RNet inference, "
                    f"batch={best_batch}, {args.dtype})"
                ),
                "value": round(best, 2),
                "unit": "clips/s",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
