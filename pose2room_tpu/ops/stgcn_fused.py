"""Fused ST-GCN block epilogue kernel for the TPU eval path.

One st-gcn block at inference is, in our folded form (models/layers.py):

    y1 = x @ M                      # graph conv, M = A folded into weights
    t1 = relu(y1 * s1 + b1')        # eval BatchNorm == affine (+ gcn bias
                                    #   folded: b1' = bias_out*s1 + b1)
    y2 = temporal_conv3(t1)         # (3,1) conv over T, per-joint C->C
    out = relu(y2 * s2 + b2' + x)   # eval BN + residual (+ conv bias
                                    #   folded: b2' = b2 + conv_bias*s2)

Run as separate XLA ops at batch 128 this costs ~36% of generate time in
pure overhead (profiled, BENCH_NOTES.md): two physical layout copies per
block for the (V,C) <-> (V*C) reshape around the matmul (the merged 3392
axis is not lane-aligned as (53,64)), plus unfused BN/ReLU/convert loop
fusions, because TPU XLA does not fuse elementwise epilogues into dots.

The division of labor here is deliberate and benchmark-driven:

* The big (B*T, 3456) x (3456, 3456) matmul STAYS IN XLA, where it runs at
  ~92% of the bf16 MXU peak — a first all-in-one Pallas version that also
  did the matmul measured ~3x lower MXU utilization because the per-tile
  VPU epilogue serialized against the systolic array.
* Everything after the matmul runs as ONE Pallas kernel over the merged,
  lane-padded layout, so the (V,C) reshape copies never materialize and
  the BN/ReLU/residual chains cost a single VMEM pass.
* The temporal (3,1) conv is column-local in the merged layout: a
  128-column tile is exactly 128/C joints' channels, so it becomes three
  128x128 block-diagonal matmuls over row-shifted tiles (pltpu.roll in
  f32 + first/last row masking implements SAME padding at clip edges —
  tiles are whole clips, so batch boundaries never cross a tile).

Padding contract: the merged width 3392 = 53*64 is padded to 3456 = 27*128.
Padded M rows/cols and padded affine entries are ZERO, so padded columns
stay exactly zero through the whole six-block chain.

Reference semantics: models/p2rnet/modules/stgcn_layers.py:362-439 (block
structure), with BN folded to affine exactly as eval-mode BatchNorm does.
`stgcn_layer_merged_ref` is the equivalent pure-jnp form used as the
non-TPU branch of lax.platform_dependent and as the golden reference in
tests/test_stgcn_fused.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def pad_merged(width):
    """Merged width rounded up to a lane multiple (3392 -> 3456)."""
    return ((width + LANE - 1) // LANE) * LANE


def _graph_matmul_bn_relu(x, M, s1, b1):
    """Graph matmul + BN1 affine + ReLU + compute-dtype cast, one XLA fusion.

    The dot keeps an f32 accumulator (rounding it to bf16 before the BN1
    affine measurably moved mAP through discrete FPS reselection,
    BENCH_NOTES.md); XLA fuses the affine/relu/cast into the dot's output
    fusion — the historical barrier to that fusion was the (V,C) reshape
    between the dot and the BN, which the merged layout removes — so t1
    hits HBM in the chain dtype (bf16 on the bf16 path: the downstream
    Pallas epilogue reads 4x less than the f32 accumulator, and this
    matches the module path's rounding point exactly — tcn_conv consumes
    bf16 there too; the f32 chain keeps f32 end-to-end).
    """
    y1 = jnp.einsum(
        "bti,io->bto",
        x,
        M,
        preferred_element_type=jnp.float32,
    )
    return jnp.maximum(y1 * s1[None, None, :] + b1[None, None, :], 0.0).astype(
        x.dtype
    )


def _epilogue_kernel(t1_ref, *rest, residual):
    """tconv-BN2-residual-ReLU for one (clip, column-tile) cell.

    t1_ref:  (T, TW) bf16 — relu(BN1(graph conv)) tile (from XLA); the
             tile width TW is a multiple of 128 (wider tiles amortize the
             per-cell DMA issue cost; the temporal-tap matmuls run per
             128-lane group so the block-diagonal taps stay 128x128).
    x_ref:   (T, TW) bf16 — block input tile; ONLY present when
             ``residual`` (a no-residual block never reads its input here,
             so the wrapper doesn't even pass it — saves the tile DMA).
    vec_ref: (8, TW) f32 — rows [s1, b1', s2, b2', 0...]; only s2/b2'
             are used here (s1/b1' are folded into the XLA matmul fusion).
    kb_ref:  (3, 128, 128) bf16 — temporal taps as block-diagonal matrices;
             tap s applies to row t+s-1 (SAME padding).
    out_ref: (T, TW) bf16.
    """
    if residual:
        x_ref, vec_ref, kb_ref, out_ref = rest
    else:
        vec_ref, kb_ref, out_ref = rest
    t1 = t1_ref[...]
    dt = t1.dtype  # chain compute dtype: bf16 (default) or f32
    T, TW = t1.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (T, LANE), 0)

    groups = []
    for g in range(TW // LANE):
        sl = slice(g * LANE, (g + 1) * LANE)
        # Row shifts per 128-lane group, in f32 (Mosaic's sublane rotate
        # has no sub-32-bit lowering); the dtype cast back for the MXU is
        # value-exact.  Working per group keeps the f32 intermediates'
        # footprint independent of the tile width.
        tg = t1[:, sl]
        tgf = tg.astype(jnp.float32)
        zero = jnp.zeros_like(tgf)
        prev = jnp.where(rows == 0, zero, pltpu.roll(tgf, 1, axis=0))
        # pltpu.roll requires a non-negative shift: roll by T-1 == roll by -1
        nxt = jnp.where(rows == T - 1, zero, pltpu.roll(tgf, T - 1, axis=0))
        groups.append(
            jnp.dot(
                prev.astype(dt), kb_ref[0],
                preferred_element_type=jnp.float32,
            )
            + jnp.dot(tg, kb_ref[1], preferred_element_type=jnp.float32)
            + jnp.dot(
                nxt.astype(dt), kb_ref[2],
                preferred_element_type=jnp.float32,
            )
        )
    y2 = groups[0] if len(groups) == 1 else jnp.concatenate(groups, axis=1)

    s2 = vec_ref[2:3, :]
    b2 = vec_ref[3:4, :]
    out = y2 * s2 + b2
    if residual:
        out = out + x_ref[...].astype(jnp.float32)
    out_ref[...] = jnp.maximum(out, 0.0).astype(dt)


def fused_epilogue(t1, x, vecs, KB, *, residual, interpret=False):
    """The Pallas tconv+BN2+residual+ReLU epilogue on merged activations.

    t1: (B, T, Wp) = relu(BN1(graph conv)) in the chain dtype; x: block
    input (same shape) — only read when ``residual``; pass None otherwise.
    Factored out of fused_stgcn_layer so the block-sparse matmul path
    (ops/stgcn_sparse.py) can reuse it — the epilogue is joint-permutation
    invariant (identical temporal taps per joint; per-column vectors are
    permuted by the caller).
    """
    B, T, Wp = t1.shape
    dt = t1.dtype
    t1 = t1.reshape(B * T, Wp)
    # wider 128-multiple tile that divides Wp: fewer, larger DMAs per cell
    # amortize issue cost (the kernel's f32 intermediates stay per-group,
    # so tile width only costs the in/out buffers in VMEM).  f32 tiles are
    # 2x the bytes — 1152-wide f32 cells blow the 16 MB scoped-VMEM limit
    # (measured: 20.25M requested), so the f32 chain caps at 384
    TW = LANE
    cands = (1152, 384) if dt == jnp.bfloat16 else (384,)
    for cand in cands:
        if Wp % cand == 0:
            TW = cand
            break
    kernel = functools.partial(_epilogue_kernel, residual=residual)
    tile = pl.BlockSpec((T, TW), lambda b, j: (b, j), memory_space=pltpu.VMEM)
    operands = [t1]
    in_specs = [tile]
    if residual:
        operands.append(x.reshape(B * T, Wp))
        in_specs.append(tile)
    operands.extend([vecs, KB])
    in_specs.extend(
        [
            pl.BlockSpec((8, TW), lambda b, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (3, LANE, LANE), lambda b, j: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ]
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, Wp // TW),
        in_specs=in_specs,
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((B * T, Wp), dt),
        cost_estimate=pl.CostEstimate(
            flops=6 * B * T * Wp * LANE,
            bytes_accessed=3 * B * T * Wp * t1.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return out.reshape(B, T, Wp)


def fused_stgcn_layer(x, M, vecs, KB, *, residual, interpret=False):
    """One st-gcn block over merged activations: XLA matmul + fused epilogue.

    Args:
        x: (B, T, W) in the chain compute dtype — bf16 (default eval
            config) or f32 (strict-parity eval; same kernels, wider tiles
            in VMEM, f32 MXU passes).  With ``residual`` W must equal Wp =
            M.shape[1] (a multiple of 128, padded columns zero); without a
            residual W may be the UNPADDED merged width — the matmul
            contracts against M's first W rows and the input is never
            touched again, so the first block needs no input pad/copy at
            all (the entry pad cost a physical copy, BENCH_NOTES.md).
        M: (Wp, Wp) bfloat16 folded graph-conv matrix (padding rows/cols 0).
        vecs: (8, Wp) float32 — rows [s1, b1', s2, b2', *unused] (see
            models/layers.py:STGCNBlock.fold_eval_arrays for the folding).
        KB: (3, 128, 128) bfloat16 block-diagonal temporal taps.
        residual: static; identity residual on/off (block 0 has none).
    Returns:
        (B, T, Wp) bfloat16.
    """
    B, T, W = x.shape
    Wp = M.shape[1]
    assert Wp % LANE == 0 and M.shape[0] == Wp, (x.shape, M.shape)
    assert W == Wp or (not residual and W <= Wp), (x.shape, M.shape)
    t1 = _graph_matmul_bn_relu(x, M[:W], vecs[0], vecs[1])
    return fused_epilogue(
        t1, x if residual else None, vecs, KB,
        residual=residual, interpret=interpret,
    )


def epilogue_merged_ref(t1, x, vecs, KB, *, residual):
    """Pure-jnp reference of fused_epilogue (same operands, same math)."""
    B, T, Wp = t1.shape
    dt = t1.dtype
    s2, b2 = (vecs[i][None, None, :] for i in (2, 3))
    t1f = t1.astype(jnp.float32)
    zero = jnp.zeros_like(t1f[:, :1])
    prev = jnp.concatenate([zero, t1f[:, :-1]], axis=1)
    nxt = jnp.concatenate([t1f[:, 1:], zero], axis=1)
    # temporal taps act per 128-column group, same block-diagonal structure
    # the kernel uses per column tile
    G = Wp // LANE
    taps = KB.astype(dt)

    def tconv(h, tap):
        return jnp.einsum(
            "btgk,ko->btgo",
            h.astype(dt).reshape(B, T, G, LANE),
            tap,
            preferred_element_type=jnp.float32,
        ).reshape(B, T, Wp)

    y2 = tconv(prev, taps[0]) + tconv(t1f, taps[1]) + tconv(nxt, taps[2])
    out = y2 * s2 + b2
    if residual:
        out = out + x.astype(jnp.float32)
    return jnp.maximum(out, 0.0).astype(dt)


def stgcn_layer_merged_ref(x, M, vecs, KB, *, residual):
    """Pure-jnp reference of the fused layer (same operands, same math).

    Used as the non-TPU branch of lax.platform_dependent and as the golden
    reference for the kernel tests.  Shapes as in fused_stgcn_layer.
    """
    W = x.shape[-1]
    t1 = _graph_matmul_bn_relu(x, M[:W], vecs[0], vecs[1])
    return epilogue_merged_ref(
        t1, x if residual else None, vecs, KB, residual=residual
    )
