#!/usr/bin/env python
"""Diagnose the round-4 f32 fused-train gradient gate failure on chip.

Round 4's official bench withheld the train section: run_train_selfcheck
(fused-chain vs module-path f32 gradients, 1e-3 median gate) FAILED on the
v5e with every leaf at median rel err 0.005-0.02 (BENCH_r04.json).  The
gate's 1e-3 bound was calibrated on CPU, where f32 matmuls are exact; on
the v5e MXU an f32 contraction at DEFAULT precision runs as bf16 passes,
so two differently-associated-but-equal formulations can legitimately
drift ~1e-2.  Neither chain sets `precision=` anywhere, so this script
A/Bs the hypothesis directly:

    leg 1 (control): the exact bench.py gate at default matmul precision
                     -- expected to reproduce the round-4 FAIL band.
    leg 2:           the same comparison traced under
                     jax.default_matmul_precision("highest") -- if the
                     kernels are correct and the drift is MXU default
                     precision, every leaf agrees at ~1e-3 and the gate
                     (not the kernels) is what needs fixing.

Run ON THE CHIP (one TPU process at a time; 4 remote compiles, budget
~10-20 min):  python scripts/diag_train_grad.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

import bench  # noqa: E402


def main():
    # mirror bench.main()'s cpu-backend append so init-on-CPU works
    try:
        platforms = jax.config.jax_platforms
        if platforms and "cpu" not in platforms.split(","):
            jax.config.update("jax_platforms", platforms + ",cpu")
    except Exception:
        pass
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    results = {}
    for mode in ("default", "highest"):
        t0 = time.time()
        print(f"=== leg: matmul precision = {mode} ===", file=sys.stderr)
        if mode == "highest":
            with jax.default_matmul_precision("highest"):
                ok = bench.run_train_selfcheck("float32")
        else:
            ok = bench.run_train_selfcheck("float32")
        results[mode] = ok
        print(
            f"=== leg {mode}: {'OK' if ok else 'FAIL'} "
            f"({time.time() - t0:.0f}s) ===",
            file=sys.stderr,
        )
    print(f"RESULT {results}")


if __name__ == "__main__":
    main()
