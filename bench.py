#!/usr/bin/env python
"""Benchmark: P2RNet inference throughput (pose clips/sec/chip).

Runs the full-size flagship model (768 frames x 53 joints -> 512 seeds ->
128 proposals, 22 classes) in deterministic generate mode, sweeps batch
sizes, and reports the best clips/sec on the attached chip.  Also publishes
the TRAIN-step section (steps/s, trained clips/s, MFU from the compiled
executable's cost analysis) at global batch 8 and 32 for both compute
dtypes, gated on an on-chip fused-vs-module gradient-agreement selftest.

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


def _log_failure(context, text):
    """Append a failure record to the committed bench_failures.log
    (shared helper — see pose2room_tpu/utils/faillog.py for the why)."""
    import sys

    sys.path.insert(0, here)
    from pose2room_tpu.utils.faillog import log_failure

    log_failure(context, text, root=here)


_FAIL_LINES = []


def _fail_print(line):
    """Print a gate-failure line to stderr AND buffer it for the log."""
    import sys

    _FAIL_LINES.append(line)
    print(line, file=sys.stderr)

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
            _fail_print(f"selftest fps ({B},{N})->{m}: FAIL ({n_bad} cells differ)")

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
        _fail_print(
            f"selftest fused-chain vs module: FAIL (max |diff| {d.max():.4f} "
            f"> {tol} * {scale:.2f})"
        )

    # 3. block-sparse eval chain vs module path — gated ONLY when
    # sparse_eval ships as the model default (then a Mosaic regression in
    # ops/stgcn_sparse.py could corrupt the headline exactly like the FPS
    # case); while it is opt-in, its on-chip agreement is checked by
    # scripts/bench_generate_ab.py instead, and the official bench does not
    # pay the extra compile.
    from pose2room_tpu.models import P2RNetConfig

    if P2RNetConfig().sparse_eval:
        model = STGCN(dtype=jnp.bfloat16, fused_eval=True, sparse_eval=True)
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
        d = np.abs(np.asarray(out["seed_features"], np.float32) - outs[False])
        if d.max() <= tol * scale:
            print(
                f"selftest sparse-chain vs module: OK (max |diff| "
                f"{d.max():.4f}, scale {scale:.2f})",
                file=sys.stderr,
            )
        else:
            ok = False
            _fail_print(
                f"selftest sparse-chain vs module: FAIL (max |diff| "
                f"{d.max():.4f} > {tol} * {scale:.2f})"
            )
    return ok


def run_train_kernel_golden(dtype_name):
    """On-chip TRAIN-kernel gate: the Pallas forward/backward kernels of the
    fused train chain vs their pure-jnp mirrors, ON REAL HARDWARE at the
    production merged shape (B=2, T=768, Wp=3456).

    This is the Mosaic-lowering check (interpret-mode tests cannot see
    lowering bugs — bench.py's FPS gate exists for exactly that reason);
    semantic fused-vs-module agreement is gated separately
    (run_train_selfcheck, f32 — see its docstring for why bf16 is excluded
    there).
    """
    import sys

    import jax
    import jax.numpy as jnp

    from pose2room_tpu.ops.stgcn_train import (
        _block_diag_taps,
        _tconv_bwd,
        _tconv_bwd_ref,
        _tconv_stats_fwd,
        _tconv_stats_fwd_ref,
    )

    dt = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    B, T, Wp, C = 2, 768, 3456, 64
    W0 = 53 * C
    rng = np.random.RandomState(3)
    y = np.zeros((B * T, Wp), np.float32)
    y[:, :W0] = rng.randn(B * T, W0) * 0.7
    vecs = np.zeros((4, Wp), np.float32)
    vecs[0, :W0] = 0.5 + rng.rand(W0)
    vecs[1, :W0] = rng.randn(W0) * 0.3
    vecs[2, :W0] = rng.randn(W0) * 0.1
    taps = rng.randn(3, C, C).astype(np.float32) * 0.15
    KB = _block_diag_taps(jnp.asarray(taps, dt))
    y = jnp.asarray(y, dt)
    vecs = jnp.asarray(vecs)
    dy2 = jnp.asarray(
        np.pad(rng.randn(B * T, W0) * 0.5, ((0, 0), (0, Wp - W0))), dt
    )
    KBT = jnp.transpose(KB, (0, 2, 1))

    rel = 3e-2 if dtype_name == "bfloat16" else 1e-4
    ok = True

    def check(name, a, b, tol=rel):
        nonlocal ok
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        err = np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)
        good = err <= tol
        ok = ok and good
        line = (
            f"selftest train-kernel [{dtype_name}] {name}: "
            f"{'OK' if good else 'FAIL'} (rel err {err:.5f} vs {tol})"
        )
        if good:
            print(line, file=sys.stderr)
        else:
            _fail_print(line)

    fwd_k = jax.jit(lambda *a: _tconv_stats_fwd(*a, T=T))
    fwd_r = jax.jit(lambda *a: _tconv_stats_fwd_ref(*a, T=T))
    y2_k, parts_k = fwd_k(y, vecs, KB)
    y2_r, parts_r = fwd_r(y, vecs, KB)
    check("fwd y2", y2_k, y2_r)
    check("fwd parts", parts_k, parts_r)
    bwd_k = jax.jit(lambda *a: _tconv_bwd(*a, T=T))
    bwd_r = jax.jit(lambda *a: _tconv_bwd_ref(*a, T=T))
    dp_k, pb_k, dkb_k = bwd_k(dy2, y, vecs, KBT)
    dp_r, pb_r, dkb_r = bwd_r(dy2, y, vecs, KBT)
    check("bwd dpre", dp_k, dp_r)
    check("bwd parts", pb_k, pb_r)
    check("bwd dkb", dkb_k, dkb_r)
    return ok


def run_train_selfcheck(dtype_name):
    """On-chip TRAIN-path gate: fused-chain gradients == module-path
    gradients through the full-size backbone (B=2, 768 frames).

    BOTH paths are traced under ``jax.default_matmul_precision("highest")``
    (the caller wraps this fn) — on the v5e MXU an f32 contraction at
    DEFAULT precision runs as bf16 passes, and two differently-associated
    but algebraically-equal formulations legitimately drift ~1e-2, which is
    exactly the round-4 failure band (BENCH_r04: every leaf at median rel
    err 0.005-0.02).  The on-chip A/B (scripts/diag_train_grad.py,
    2026-08-19) proved the kernels correct: at HIGHEST precision all 72
    leaves agree at worst-median 3.4e-4, while the identical comparison at
    default precision reproduces the r04 FAIL band.  Comparing at HIGHEST
    keeps the sharp 1e-3 gate sound; the TIMED legs (run_train_bench) still
    run at the production default precision.

    f32 ONLY: on that path the fused chain is a pure reassociation of the
    module math, so every gradient leaf agrees to ~1e-3 median and the
    check is sharp.  On bf16 the two paths round at different points
    (bf16 inter-block activations vs the module path's f32), and the
    divergence compounds through six blocks into ~3-5% median gradient
    drift — a designed, convergence-A/B'd difference, not a bug signal, so
    a bf16 gate here would only measure that known gap.  bf16 kernel
    correctness on real hardware is gated by run_train_kernel_golden.

    The loss is a fixed weighted sum of seed_features — deliberately
    upstream of the discrete FPS/proposal stages, whose reselection under
    rounding would make a full-model grad comparison flaky (the same
    reasoning as the eval selfcheck's seed_features comparison).  Criteria
    mirror tests/test_stgcn_train.py's block-level bounds: the BULK of each
    leaf's gradient must agree (median relative error), with a small
    allowance for ReLU-boundary flips (the two paths reassociate
    differently, so isolated pre-activations can cross zero).
    """
    import sys

    import jax
    import jax.numpy as jnp

    from pose2room_tpu.models.stgcn import STGCN

    dt = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 768, 53, 3).astype(np.float32) * 0.5)
    w = jnp.asarray(rng.randn(2, 512, 256).astype(np.float32))
    key = jax.random.PRNGKey(0)

    grads = {}
    for fused in (True, False):
        model = STGCN(dtype=dt, fused_train=fused)
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

        def loss(params, bs, mdl=model):
            out, _ = mdl.apply(
                {"params": params, "batch_stats": bs}, x, train=True,
                mutable=["batch_stats"],
            )
            return jnp.sum(out["seed_features"].astype(jnp.float32) * w)

        grads[fused] = jax.jit(jax.grad(loss))(
            variables["params"], variables["batch_stats"]
        )

    flat_f = jax.tree_util.tree_leaves_with_path(grads[True])
    flat_m = jax.tree_util.tree_leaves_with_path(grads[False])
    bf = dtype_name == "bfloat16"
    med_tol, flip_err, flip_frac = (
        (3e-2, 7e-2, 0.02) if bf else (1e-3, 5e-2, 1e-3)
    )
    # reference scale for the conv-bias exemption below: the largest BN2
    # shift gradient across the module-path tree
    bn2_scale = max(
        float(np.abs(np.asarray(g, np.float32)).max())
        for p, g in flat_m
        if "tcn_bn2" in jax.tree_util.keystr(p)
        and "bias" in jax.tree_util.keystr(p)
    )
    ok = True
    worst = (0.0, "")
    for (path, a), (_, b) in zip(flat_f, flat_m):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        key_s = jax.tree_util.keystr(path)
        if "tcn_conv" in key_s and "bias" in key_s:
            # the conv bias feeds straight into BN2, which absorbs
            # per-channel shifts: the TRUE gradient is exactly zero.  The
            # fused VJP returns the analytic zero; module-path autodiff
            # returns rounding noise — comparing noise to noise is
            # meaningless, so require both to be noise-small instead
            # (same reasoning as tests/test_stgcn_train.py's cb case).
            if (np.abs(a).max() > 0.3 * bn2_scale
                    or np.abs(b).max() > 0.3 * bn2_scale):
                ok = False
                _fail_print(
                    f"selftest train-grad [{dtype_name}] {key_s}: FAIL "
                    f"(conv-bias grad not noise-small: fused "
                    f"{np.abs(a).max():.4f}, module {np.abs(b).max():.4f} "
                    f"vs bn2 scale {bn2_scale:.4f})"
                )
            continue
        scale = max(np.abs(b).max(), 1e-3)
        err = np.abs(a - b) / scale
        med = float(np.median(err))
        frac = float(np.mean(err > flip_err))
        if med > worst[0]:
            worst = (med, jax.tree_util.keystr(path))
        if med > med_tol or frac > flip_frac:
            ok = False
            _fail_print(
                f"selftest train-grad [{dtype_name}] {jax.tree_util.keystr(path)}: "
                f"FAIL (median rel err {med:.4f}, flip frac {frac:.4f})"
            )
    if ok:
        print(
            f"selftest train-grad fused-vs-module [{dtype_name}]: OK "
            f"({len(flat_f)} leaves, worst median rel err {worst[0]:.5f} "
            f"at {worst[1]})",
            file=sys.stderr,
        )
    return ok


# v5e MXU peak: 197 TF/s (bf16 passes).  BOTH dtypes quote MFU against it:
# at jax's DEFAULT matmul precision an f32 contraction also executes as
# bf16 MXU passes (the same fact that root-caused the round-4 train-gate
# failure — see run_train_selfcheck), so 197 TF/s is the real ceiling of
# the timed program for f32 too.  A ~49 TF/s f32 ceiling would apply only
# under precision=HIGHEST, which the production step does not use; quoting
# against it produced a nonsensical 176% MFU (round-5 first run).
_V5E_PEAK = {"bfloat16": 197e12, "float32": 197e12}


def run_train_bench(dtypes=("bfloat16", "float32"), batches=(8, 32),
                    iters=10):
    """Official train-step benchmark: steps/s + trained clips/s + MFU.

    Chained timing (state donation keeps the loop on-device, one sync at
    the end) — the production engine achieves this via async dispatch +
    one-step-late metric drain (train/engine.py), so the chained number is
    the real device step.  FLOPs come from the compiled executable's own
    cost analysis (XLA), so the MFU denominator tracks the actual program,
    not a hand model.  Returns {"<dtype>_b<batch>": {...}} for the JSON
    line; prints one stderr line per leg.
    """
    import sys

    import jax
    import jax.numpy as jnp

    from pose2room_tpu.models import P2RNet, P2RNetConfig
    from pose2room_tpu.train.state import create_train_state
    from pose2room_tpu.train.step import make_train_step

    dev = jax.devices()[0]
    key = jax.random.PRNGKey(0)
    out = {}
    for dtype_name in dtypes:
        for B in batches:
            rng = np.random.RandomState(0)
            batch = {
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
            batch = {k: jax.device_put(jnp.asarray(v), dev) for k, v in batch.items()}
            model = P2RNet(config=P2RNetConfig(compute_dtype=dtype_name))
            state, tx, _ = create_train_state(
                model, key, np.zeros((B, 768, 53, 3), np.float32), {"lr": 1e-3}
            )
            state = jax.device_put(state, dev)
            # AOT-compile ONCE and reuse the executable for both the timing
            # loop and its own cost analysis (a second .lower() after a
            # traced call would pay the remote compile twice)
            step = make_train_step(model, tx).lower(state, batch, key).compile()
            try:
                analysed = step.cost_analysis()
                if isinstance(analysed, (list, tuple)):
                    analysed = analysed[0]
                flops = float(analysed.get("flops", 0.0)) or None
            except Exception:
                flops = None
            state, losses = step(state, batch, key)  # warmup
            jax.block_until_ready(losses["total"])

            best = None
            for _ in range(3):
                st = state
                t0 = time.perf_counter()
                for _ in range(iters):
                    st, losses = step(st, batch, key)
                jax.block_until_ready(losses["total"])
                dt_step = (time.perf_counter() - t0) / iters
                state = st
                best = dt_step if best is None else min(best, dt_step)
            steps_per_sec = 1.0 / best
            clips_per_sec = B * steps_per_sec
            mfu = (
                flops / best / _V5E_PEAK[dtype_name] if flops else None
            )
            leg = {
                "step_ms": round(best * 1e3, 2),
                "clips_per_sec": round(clips_per_sec, 1),
            }
            if mfu is not None:
                leg["mfu"] = round(mfu, 3)
                leg["tflops_per_step"] = round(flops / 1e12, 3)
            out[f"{dtype_name}_b{B}"] = leg
            print(
                f"train {dtype_name} batch={B} (fused chain): "
                f"{best * 1e3:.2f} ms/step, {clips_per_sec:.1f} trained "
                f"clips/s"
                + (
                    f", {flops / 1e12:.2f} TF/step, MFU "
                    f"{mfu:.1%} of {_V5E_PEAK[dtype_name] / 1e12:.0f} TF/s"
                    if mfu is not None else ""
                ),
                file=sys.stderr,
            )
    return out


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
    parser.add_argument(
        "--skip-train", action="store_true",
        help="inference sweep only (iteration; the official bench also "
        "publishes the train-step section)",
    )
    parser.add_argument(
        "--train-dtypes", default="bfloat16,float32",
        help="comma list of train-leg dtypes; the official bench publishes "
        "both (each extra leg costs a full remote compile — trim for "
        "iteration runs)",
    )
    parser.add_argument("--train-batches", default="8,32")
    parser.add_argument(
        "--train-timeout", type=int, default=2700,
        help="watchdog-thread bound (s) on the whole train section — a hung "
        "remote compile must not push the official run past the driver "
        "timeout (rc 6, inference headline still published). Sized for a "
        "cold compile cache: both dtypes need ~8 fresh remote compiles "
        "(kernel goldens + 2 HIGHEST-precision selfcheck traces + 4 AOT "
        "legs) at the documented 40-300 s each — 1800 s only covered the "
        "warm-cache case",
    )
    parser.add_argument(
        "--device-probe-timeout", type=int, default=600,
        help="bound (s) on a subprocess device probe run before in-process "
        "backend init; 0 disables. A tunnel outage blocks jax.devices() in "
        "uninterruptible C code — probing in a killable child turns a "
        "silent driver timeout into a legible failure",
    )
    args = parser.parse_args()

    if args.device_probe_timeout:
        import subprocess

        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=args.device_probe_timeout,
                check=True,
                capture_output=True,
            )
        except subprocess.TimeoutExpired:
            print(
                f"bench.py: device backend did not initialize within "
                f"{args.device_probe_timeout}s — accelerator tunnel is "
                "unreachable (environment outage, not a code failure); "
                "refusing to hang. Re-run when the chip is back.",
                file=sys.stderr,
            )
            sys.exit(5)
        except subprocess.CalledProcessError as e:
            print(
                "bench.py: device probe subprocess failed:\n"
                + e.stderr.decode(errors="replace")[-2000:],
                file=sys.stderr,
            )
            sys.exit(5)

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
            _log_failure(
                "bench.py eval selfcheck FAILED (no number published)",
                "\n".join(_FAIL_LINES),
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
    def fold_eval(variables):
        return model.apply(variables, method=P2RNet.fold_eval)

    # weight-only graph-matrix fold, once (the serving configuration —
    # runners/test.py and demo.py do the same via make_fold_fn); inline
    # re-folding costs ~0.54 ms/step of device time (BENCH_NOTES round-4)
    folded = fold_eval(variables) or None

    @jax.jit
    def generate(variables, x, folded):
        out = model.apply(variables, x, folded=folded, method=P2RNet.generate)
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
            out = generate(variables, x, folded)
            jax.block_until_ready(out)
            n_iter = 30
            t0 = time.perf_counter()
            for _ in range(n_iter):
                out = generate(variables, x, folded)
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
    # Guard and record ONLY official-shape runs (default sweep, selfcheck
    # on): an iteration run like `--batches 1` legitimately lands ~3x under
    # the batch-128 headline and must neither trip the guard nor overwrite
    # the recorded baseline with a number the next official run would then
    # be compared against.
    official_sweep = (
        args.batches == parser.get_default("batches")
        and not args.skip_selfcheck
    )
    last_path = os.path.join(here, "last_bench.json")
    expected = None
    if jax.default_backend() != "cpu" and official_sweep:
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
            _log_failure(
                "bench.py machine-health guard tripped (no number published)",
                f"headline {best:.1f} clips/s vs recorded {expected:.1f}",
            )
            sys.exit(3)
    if jax.default_backend() != "cpu" and official_sweep:
        try:
            with open(last_path) as f:
                rec = json.load(f)
        except Exception:
            rec = {}
        rec[args.dtype] = round(best, 2)
        with open(last_path, "w") as f:
            json.dump(rec, f)
    vs_baseline = best / TORCH_CPU_CLIPS_PER_SEC if TORCH_CPU_CLIPS_PER_SEC else None
    record = {
        "metric": (
            f"pose clips/sec/chip (P2RNet inference, "
            f"batch={best_batch}, {args.dtype})"
        ),
        "value": round(best, 2),
        "unit": "clips/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
    }
    # forensic copy of the (already selfcheck-gated) headline BEFORE the
    # train section: train costs ~6 more remote compiles, and if it hangs
    # past the driver timeout the number must already be in the output tail
    # (stderr so the single stdout JSON line below stays the parse target)
    print(json.dumps(record), file=sys.stderr, flush=True)

    # ---- official train-step section (VERDICT r3 #2): steps/s, trained
    # clips/s and MFU at the reference recipe's global batches (8 = one GPU
    # worth, 32 = the 4-GPU recipe, p2rnet_train.yaml + scripts/train.sh),
    # gated on the on-chip kernel goldens + fused-vs-module grad agreement.
    # Hang/crash-proofed: the independently-gated inference headline above
    # must publish even if the train legs die — a watchdog thread bounds a
    # remote compile that never returns, the blanket except records the
    # failure in the JSON instead of raising.
    if jax.default_backend() != "cpu" and not args.skip_train:
        import threading

        # Watchdog THREAD, not SIGALRM: a remote compile hung in PJRT C++
        # defers a Python signal handler indefinitely (the main thread never
        # re-enters bytecode), but blocked RPC waits release the GIL, so a
        # timer thread still runs — it publishes the already-gated inference
        # headline on stdout and hard-exits with a distinct rc.
        def _watchdog():
            print(
                f"bench.py: train section exceeded {args.train_timeout}s "
                "(hung remote compile?) — publishing the inference headline "
                "without it and exiting",
                file=sys.stderr,
                flush=True,
            )
            _log_failure(
                "bench.py train section watchdog timeout",
                f"exceeded {args.train_timeout}s (hung remote compile?)",
            )
            record["train_error"] = "watchdog timeout"
            print(json.dumps(record), flush=True)
            os._exit(6)

        timer = threading.Timer(args.train_timeout, _watchdog)
        timer.daemon = True
        timer.start()
        try:
            train_dtypes = tuple(args.train_dtypes.split(","))
            if args.skip_selfcheck:
                gates = True
            else:
                gates = all(run_train_kernel_golden(d) for d in train_dtypes)
                if gates:
                    # HIGHEST so the 1e-3 reassociation gate is sound on
                    # the MXU (see run_train_selfcheck docstring; the r04
                    # failure was default-precision bf16-pass drift, not a
                    # kernel bug — scripts/diag_train_grad.py)
                    with jax.default_matmul_precision("highest"):
                        gates = run_train_selfcheck("float32")
            if not gates:
                print(
                    "bench.py: on-chip TRAIN selftest FAILED — train "
                    "numbers not published",
                    file=sys.stderr,
                )
                _log_failure(
                    "bench.py TRAIN selftest FAILED (train section withheld)",
                    "\n".join(_FAIL_LINES),
                )
                record["train_selfcheck"] = "FAILED"
            else:
                record["train"] = run_train_bench(
                    dtypes=train_dtypes,
                    batches=tuple(int(b) for b in args.train_batches.split(",")),
                )
        except Exception as e:
            print(
                f"bench.py: train section failed ({type(e).__name__}: {e}) "
                "— publishing the inference headline without it",
                file=sys.stderr,
            )
            _log_failure(
                "bench.py train section exception",
                f"{type(e).__name__}: {e}",
            )
            record["train_error"] = f"{type(e).__name__}: {e}"
        finally:
            timer.cancel()

    print(json.dumps(record))


if __name__ == "__main__":
    main()
