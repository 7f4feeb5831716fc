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
import os
import time

import numpy as np

here = os.path.dirname(os.path.abspath(__file__))

# measured by scripts/measure_torch_baseline.py (torch CPU, batch-1..8 sweep)
TORCH_CPU_CLIPS_PER_SEC = None  # filled from BENCH_NOTES.md if measured
try:
    import re
    with open(os.path.join(here, "BENCH_NOTES.md")) as f:
        m = re.search(r"torch_cpu_clips_per_sec:\s*([0-9.]+)", f.read())
        if m:
            TORCH_CPU_CLIPS_PER_SEC = float(m.group(1))
except Exception:
    pass


def run_selfchecks():
    """On-chip kernel self-checks, run before timing (gates the bench).

    Interpret-mode tests cannot see Mosaic lowering bugs — a round-1 FPS
    kernel was wrong ONLY for B>8 on real hardware (BENCH_NOTES.md "FPS
    kernel") — so a toolchain regression could otherwise publish a wrong
    number silently.  Checks (stderr; the single JSON line stays stdout):

    1. Pallas FPS == XLA scan, bit-exact, at both model shapes;
    2. fused ST-GCN chain vs per-block module path on the full-size
       backbone: same params, bf16-level seed_feature agreement (the two
       are reassociations of the same math; the tolerance is far below
       garbage-output level but above bf16 reassociation noise).

    Returns True if all checks pass.
    """
    import functools
    import sys

    import jax
    import jax.numpy as jnp

    from pose2room_tpu.ops.sampling import _fps_xla, _fps_pallas
    from pose2room_tpu.models.stgcn import STGCN

    ok = True
    rng = np.random.RandomState(7)
    for B, N, m in [(8, 512, 128), (32, 512, 128)]:
        xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        ref = np.asarray(jax.jit(functools.partial(_fps_xla, npoint=m))(xyz))
        got = np.asarray(jax.jit(functools.partial(_fps_pallas, npoint=m))(xyz))
        if (ref == got).all():
            print(f"selftest fps ({B},{N})->{m}: OK (bit-exact)", file=sys.stderr)
        else:
            ok = False
            n_bad = int((ref != got).sum())
            print(
                f"selftest fps ({B},{N})->{m}: FAIL ({n_bad} cells differ)",
                file=sys.stderr,
            )

    x = rng.randn(8, 768, 53, 3).astype(np.float32) * 0.5
    x[..., 0] += np.linspace(0, 3, 768)[None, :, None]
    key = jax.random.PRNGKey(0)
    outs = {}
    for fused in (True, False):
        model = STGCN(dtype=jnp.bfloat16, fused_eval=fused)
        # init on CPU (eager on-device init is minutes-slow through the
        # tunnel); param trees are identical for both paths (tested)
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            cpu = None
        if cpu is not None and jax.default_backend() != "cpu":
            with jax.default_device(cpu):
                variables = model.init({"params": key}, x[:1], train=False)
            variables = jax.device_put(variables, jax.devices()[0])
        else:
            variables = model.init({"params": key}, x[:1], train=False)
        out = jax.jit(lambda v, xx, mdl=model: mdl.apply(v, xx, train=False))(
            variables, x
        )
        outs[fused] = np.asarray(out["seed_features"], np.float32)
    d = np.abs(outs[True] - outs[False])
    scale = max(np.abs(outs[False]).max(), 1e-6)
    tol = 0.05  # relative: reassociation noise is ~1e-3; garbage is O(1)
    if d.max() <= tol * scale:
        print(
            f"selftest fused-chain vs module: OK (max |diff| {d.max():.4f}, "
            f"scale {scale:.2f})",
            file=sys.stderr,
        )
    else:
        ok = False
        print(
            f"selftest fused-chain vs module: FAIL (max |diff| {d.max():.4f} "
            f"> {tol} * {scale:.2f})",
            file=sys.stderr,
        )
    return ok


def main():
    import argparse
    import sys

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
    parser.add_argument(
        "--skip-selfcheck", action="store_true",
        help="skip the on-chip kernel parity gate (iteration only; the "
        "official bench always runs it)",
    )
    args = parser.parse_args()

    try:
        platforms = jax.config.jax_platforms
        if platforms and "cpu" not in platforms.split(","):
            jax.config.update("jax_platforms", platforms + ",cpu")
    except Exception:
        pass

    if jax.default_backend() != "cpu" and not args.skip_selfcheck:
        if not run_selfchecks():
            print(
                "bench.py: on-chip kernel selftest FAILED — refusing to "
                "publish a number",
                file=sys.stderr,
            )
            sys.exit(1)

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

    def run_sweep():
        best, best_batch = 0.0, 1
        for batch in (int(b) for b in args.batches.split(",")):
            x = rng.randn(batch, 768, 53, 3).astype(np.float32) * 0.5
            x[..., 0] += np.linspace(0, 3, 768)[None, :, None]
            # pre-stage on device: measures chip throughput; a production
            # input pipeline overlaps H2D with compute (and this dev harness
            # reaches the chip through a network tunnel, so per-call H2D is
            # not representative of a real TPU host)
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
            print(
                f"sweep batch={batch}: {clips_per_sec:.1f} clips/s "
                f"({dt / n_iter * 1e3 / batch:.2f} ms/clip, "
                f"{dt / n_iter * 1e3:.2f} ms/batch)",
                file=sys.stderr,
            )
            if clips_per_sec > best:
                best = clips_per_sec
                best_batch = batch
        return best, best_batch

    best, best_batch = run_sweep()

    # Machine-health plausibility guard: the selfcheck gates CORRECTNESS,
    # but a recorded environment anomaly (BENCH_NOTES.md: one run reported
    # ~50 clips/s across all batch sizes with selftests green, and the next
    # identical run was normal) could still publish a garbage number.
    # Compare against the last recorded headline for this dtype; if off by
    # >2x either way, re-run the whole sweep once and fail with a distinct
    # rc if still implausible.
    last_path = os.path.join(here, "last_bench.json")
    expected = None
    if jax.default_backend() != "cpu":
        try:
            with open(last_path) as f:
                expected = json.load(f).get(args.dtype)
        except Exception:
            expected = None
    if expected and not (expected / 2 <= best <= expected * 2):
        print(
            f"bench.py: headline {best:.1f} clips/s is >2x off the last "
            f"recorded {expected:.1f} — re-running once (machine-health "
            "guard)",
            file=sys.stderr,
        )
        best, best_batch = run_sweep()
        if not (expected / 2 <= best <= expected * 2):
            print(
                f"bench.py: still implausible ({best:.1f} vs recorded "
                f"{expected:.1f}) — refusing to publish; likely an "
                "environment anomaly, re-run on a healthy machine",
                file=sys.stderr,
            )
            sys.exit(3)
    if jax.default_backend() != "cpu":
        try:
            with open(last_path) as f:
                rec = json.load(f)
        except Exception:
            rec = {}
        rec[args.dtype] = round(best, 2)
        with open(last_path, "w") as f:
            json.dump(rec, f)
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
