#!/usr/bin/env python
"""A/B the block-sparse folded graph-conv matmul vs the dense XLA form.

Measures, on the real chip at the full eval shape (B*T = 98304 rows,
Wp = 3456), the per-block cost of:

  1. dense XLA matmul + fused BN1 affine/ReLU (the round-3 shipped form,
     stgcn_fused._graph_matmul_bn_relu);
  2. the Pallas block-sparse kernel, natural joint order (391/729 tiles);
  3. the Pallas block-sparse kernel, SPARSE_JOINT_ORDER (279/729 tiles).

Each variant is correctness-checked on chip against the dense result
before timing (the sparse tiles densify to exactly the same M).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_sparse_matmul.py [--dtype bfloat16] [--batch 128]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from pose2room_tpu.models.graph import SPARSE_JOINT_ORDER, build_spatial_graph
from pose2room_tpu.ops.stgcn_fused import _graph_matmul_bn_relu
from pose2room_tpu.ops.stgcn_sparse import (
    gather_m_tiles,
    sparse_graph_matmul_bn_relu,
    sparse_tile_lists,
)


def build_operands(rng, order, dtype, batch, T=768):
    V, C = 53, 64
    Wp = 3456
    A = build_spatial_graph()
    pair = (A != 0).any(0)
    col_off, vlist = sparse_tile_lists(pair, order)
    # random folded matrix honoring the support, joint-permuted
    sup = np.zeros((54, 54), bool)
    sup[:V, :V] = pair
    M = rng.randn(54, C, 54, C).astype(np.float32) * 0.05
    M *= sup[:, None, :, None]
    Mp = (
        M[np.ix_(order, np.arange(C), order, np.arange(C))]
        .reshape(Wp, Wp)
        .astype(dtype)
    )
    tiles = gather_m_tiles(Mp, col_off, vlist)
    x = (rng.randn(batch, T, Wp) * 0.5).astype(dtype)
    # zero the pad joint's columns in permuted space
    pad_slot = int(np.where(order == 53)[0][0])
    x_np = np.asarray(x, np.float32)
    x_np[..., pad_slot * C : (pad_slot + 1) * C] = 0
    x = x_np.astype(dtype)
    vecs = np.zeros((8, Wp), np.float32)
    vecs[0] = rng.rand(Wp) + 0.5
    vecs[1] = rng.randn(Wp)
    vecs[:, pad_slot * C : (pad_slot + 1) * C] = 0
    return x, Mp, tiles, vecs, col_off, vlist


def time_fn(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    dev = jax.devices()[0]
    print(f"device: {dev}, dtype {args.dtype}, batch {args.batch}")
    rng = np.random.RandomState(0)

    dense_fn = jax.jit(
        lambda x, M, vecs: _graph_matmul_bn_relu(x, M, vecs[0], vecs[1])
    )
    sparse_fn = jax.jit(sparse_graph_matmul_bn_relu)

    results = {}
    dense_ms = None
    for name, order in [
        ("natural", np.arange(54, dtype=np.int32)),
        ("sa-order", SPARSE_JOINT_ORDER),
    ]:
        x, Mp, tiles, vecs, col_off, vlist = build_operands(
            rng, order, dtype, args.batch
        )
        put = lambda a: jax.device_put(jnp.asarray(a), dev)
        x, Mp, tiles, vecs = map(put, (x, Mp, tiles, vecs))
        col_off, vlist_d = put(col_off), put(vlist)

        ref = dense_fn(x, Mp, vecs)
        got = sparse_fn(x, tiles, vecs, col_off, vlist_d)
        err = float(
            jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
        )
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
        ok = err <= 0.02 * max(scale, 1e-6)
        print(f"[{name}] nnz tiles {len(vlist)}/729  on-chip max|diff| "
              f"{err:.5f} (scale {scale:.2f}) {'OK' if ok else 'FAIL'}")
        if not ok:
            raise SystemExit(1)

        if dense_ms is None:
            dense_ms = time_fn(dense_fn, x, Mp, vecs, iters=args.iters)
            print(f"dense XLA matmul+affine:  {dense_ms:8.2f} ms/block")
        ms = time_fn(
            sparse_fn, x, tiles, vecs, col_off, vlist_d, iters=args.iters
        )
        results[name] = ms
        print(f"sparse kernel [{name}]:   {ms:8.2f} ms/block  "
              f"({dense_ms / ms:.2f}x dense)")

    print("\nsummary (ms/block):", {"dense": round(dense_ms, 2),
          **{k: round(v, 2) for k, v in results.items()}})


if __name__ == "__main__":
    main()
