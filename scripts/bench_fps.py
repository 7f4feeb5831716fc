#!/usr/bin/env python
"""FPS micro-benchmark + on-hardware parity check: XLA scan vs Pallas kernel.

The Pallas kernel is the TPU default in ops/sampling.py; this script verifies
the two implementations agree bit-exactly ON THE REAL CHIP (interpret-mode
tests cannot catch Mosaic lowering bugs — an earlier kernel revision was
wrong only for B>8) and prints the timing table recorded in BENCH_NOTES.md.

Usage: python scripts/bench_fps.py [--repeat 200]
"""

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from pose2room_tpu.ops.sampling import _fps_xla, _fps_pallas


def timeit(fn, *args, repeat=200):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(repeat):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeat * 1e3  # ms


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--repeat", type=int, default=200)
    args = parser.parse_args()

    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")
    rng = np.random.RandomState(0)
    rows = []
    mismatch = False
    for B, N, m in [(8, 512, 128), (32, 512, 128), (32, 512, 64)]:
        xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        xla = jax.jit(functools.partial(_fps_xla, npoint=m))
        pallas = jax.jit(functools.partial(_fps_pallas, npoint=m))

        ref = np.asarray(xla(xyz))
        got = np.asarray(pallas(xyz))
        ok = bool((got == ref).all())
        if not ok:
            mismatch = True
            bad = np.argwhere(got != ref)
            print(f"pallas MISMATCH at ({B},{N})->{m}: {len(bad)} cells; "
                  f"rows {sorted(set(bad[:, 0].tolist()))[:8]}")

        t_xla = timeit(xla, xyz, repeat=args.repeat)
        t_pal = timeit(pallas, xyz, repeat=args.repeat)
        rows.append((f"({B},{N})->{m}", t_xla, t_pal, ok))

    print("\n| shape | xla scan | pallas kernel |")
    print("|---|---|---|")
    for shape, a, b, ok in rows:
        print(f"| {shape} | {a:.3f} ms | {b:.3f} ms{'' if ok else ' (WRONG)'} |")
    sys.exit(1 if mismatch else 0)


if __name__ == "__main__":
    main()
