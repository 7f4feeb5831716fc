"""Fused ST-GCN block for the TRAIN path: custom VJP through live BN stats.

Eval got its 47% generate win from the merged-layout fused chain
(ops/stgcn_fused.py); the train step kept the per-block module path and with
it the same overhead shape (~17% layout copies around tcn_conv and its
gradient + ~19% BN stat/grad loop fusions, trace #2 in BENCH_NOTES.md).  A
pure-XLA merged train path was built and REJECTED (41.7 vs 37.1 ms): the
(B,T,Wp)->(B,T,G,128) regroup for a batched tconv einsum materializes its
own copies and the block-diagonal form doubles tconv FLOPs — and backward
multiplies all of it.  This module is the parked design from those notes:
keep the merged layout end-to-end, run the tconv (and its transpose) as
Pallas kernels, and hand-write the whole block's VJP so BatchNorm TRAINS on
live batch statistics (two-pass: per-column partial moments reduced
per-channel in XLA between kernels).

One block, in the folded merged form (models/layers.py:STGCNBlock):

    y   = x @ M + bias_col                  # folded graph conv (XLA matmul)
    n1  = (y - mean1) * rsqrt(var1 + eps)   # LIVE batch stats over (B,T,V)
    t1  = relu(g1 * n1 + b1)
    y2  = tconv3(t1) + cb                   # (3,1) conv == block-diag taps
    n2  = (y2 - mean2) * rsqrt(var2 + eps)  # live stats again
    out = relu(g2 * n2 + b2 [+ x])          # identity residual

Division of labor (same benchmark-driven split as the eval chain):
* both big matmuls (forward graph conv, and backward's dy@M^T / x^T@dy)
  stay in XLA at MXU peak;
* the tconv + BN-affine epilogues (and their transposes) are Pallas
  kernels over (T, tile)-cells of the merged lane-padded layout — no
  (V,C)<->(V*C) relayout ever materializes;
* per-channel BN statistics come from per-COLUMN moments: the kernels emit
  per-cell column partials, XLA reduces them and folds column->channel
  (the merged layout is v-major/c-minor, so a (Wp/C, C) reshape of a
  column vector is free), identical values up to reassociation.

Rounding points (chain dtype = the model compute dtype, bf16 or f32 since
round 4 — mirroring the round-3 f32 extension of the eval chain): on the
bf16 path inter-block activations are bf16 (the module train path keeps f32
between blocks) and BN1 consumes the bf16-rounded matmul output — a
bf16-level divergence from the module path, validated by
gradient-equivalence tests (tests/test_stgcn_train.py) and a convergence
A/B (BENCH_NOTES.md).  On the f32 path every rounding cast is a no-op, so
the chain differs from the module path only by reassociation; tiles are
384-wide (the scoped-VMEM cap, same as ops/stgcn_fused.py's f32 leg).

Reference hot loop being replaced: stgcn_layers.py:362-439 (st_gcn_block
train forward/backward through torch BatchNorm2d).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_EPS = 1e-5


def _pick_tile(Wp, itemsize=2):
    # f32 tiles cap at 384 lanes (scoped-VMEM; same rule as the eval
    # chain's f32 leg in ops/stgcn_fused.py)
    cands = (1152, 384) if itemsize == 2 else (384,)
    for cand in cands:
        if Wp % cand == 0:
            return cand
    return LANE


def _tile_cols(vec_c, V, C, Wp):
    """(C,) per-channel -> (Wp,) per-column, zero on padded groups."""
    w = jnp.tile(vec_c, V)
    return jnp.pad(w, (0, Wp - V * C))


def _chan_sum(col_vec, C):
    """(Wp,) per-column sums -> (C,) per-channel (pad groups are zero)."""
    return col_vec.reshape(-1, C).sum(0)


def _block_diag_taps(taps):
    """(3, C, C) temporal taps -> (3, 128, 128) block-diagonal matrices."""
    C = taps.shape[-1]
    reps = LANE // C
    eye = jnp.eye(reps, dtype=taps.dtype)
    return jnp.einsum("sio,pq->spiqo", taps, eye).reshape(3, LANE, LANE)


def _fold_diag_blocks(m, C):
    """(3, 128, 128) dense gradient -> (3, C, C) block-diagonal fold."""
    reps = LANE // C
    out = 0.0
    for p in range(reps):
        out = out + m[:, p * C : (p + 1) * C, p * C : (p + 1) * C]
    return out


# ---------------------------------------------------------------------------
# forward: BN1-affine + ReLU + tconv (+cb) + column partial moments
# ---------------------------------------------------------------------------

def _fwd_kernel(y_ref, vec_ref, kb_ref, y2_ref, part_ref):
    """One (clip, column-tile) cell.

    y_ref:   (T, TW) chain-dtype merged graph-conv output (+bias).
    vec_ref: (4, TW) f32 rows [s1col, sh1col, cbcol, 0] — the TRAIN BN1
             expressed as an affine with live stats folded by the caller.
    kb_ref:  (3, 128, 128) chain-dtype block-diagonal taps (tap s -> row
             t+s-1).
    y2_ref:  (T, TW) chain-dtype conv output (pre-BN2), dtype-rounded.
    part_ref:(1, 2, TW) f32 — per-column [sum(y2), sum(y2^2)] over this
             cell's T rows, computed from the ROUNDED y2 (BN2 must see the
             same values it will normalize).
    """
    y = y_ref[...]
    dt = y_ref.dtype
    T, TW = y.shape
    s1 = vec_ref[0:1, :]
    sh1 = vec_ref[1:2, :]
    cb = vec_ref[2:3, :]
    rows = jax.lax.broadcasted_iota(jnp.int32, (T, LANE), 0)

    # full-width vector work first (Mosaic lowers (1, TW) -> (T, TW)
    # broadcasts fine; broadcasting a SLICED (1, 128) inside the group loop
    # hit an "Invalid input layout" on real hardware), then per-128-group
    # tap matmuls exactly as in the eval epilogue kernel
    t1_full = jnp.maximum(
        y.astype(jnp.float32) * s1 + sh1, 0.0
    ).astype(dt)

    groups = []
    for g in range(TW // LANE):
        sl = slice(g * LANE, (g + 1) * LANE)
        tg = t1_full[:, sl]
        tgf = tg.astype(jnp.float32)
        zero = jnp.zeros_like(tgf)
        prev = jnp.where(rows == 0, zero, pltpu.roll(tgf, 1, axis=0))
        nxt = jnp.where(
            rows == T - 1, zero, pltpu.roll(tgf, T - 1, axis=0)
        )
        groups.append(
            jnp.dot(prev.astype(dt), kb_ref[0],
                    preferred_element_type=jnp.float32)
            + jnp.dot(tg, kb_ref[1], preferred_element_type=jnp.float32)
            + jnp.dot(nxt.astype(dt), kb_ref[2],
                      preferred_element_type=jnp.float32)
        )
    y2f = groups[0] if len(groups) == 1 else jnp.concatenate(groups, axis=1)
    y2 = (y2f + cb).astype(dt)
    y2_ref[...] = y2
    y2r = y2.astype(jnp.float32)
    part_ref[0, 0:1, :] = jnp.sum(y2r, axis=0, keepdims=True)
    part_ref[0, 1:2, :] = jnp.sum(y2r * y2r, axis=0, keepdims=True)


def _tconv_stats_fwd(y, vecs, KB, *, T, interpret=False):
    """y: (N, Wp) chain dtype; vecs: (4, Wp) f32; KB: (3,128,128) chain dt.

    Returns (y2 (N, Wp) chain dtype, parts (B, 2, Wp) f32) with N = B*T.
    """
    N, Wp = y.shape
    B = N // T
    TW = _pick_tile(Wp, y.dtype.itemsize)
    tile = pl.BlockSpec((T, TW), lambda b, j: (b, j), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(B, Wp // TW),
        in_specs=[
            tile,
            pl.BlockSpec((4, TW), lambda b, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, LANE, LANE), lambda b, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            tile,
            pl.BlockSpec((1, 2, TW), lambda b, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, Wp), y.dtype),
            jax.ShapeDtypeStruct((B, 2, Wp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * N * Wp * LANE,
            bytes_accessed=2 * N * Wp * y.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(y, vecs, KB)


def _tconv_stats_fwd_ref(y, vecs, KB, *, T):
    """Pure-jnp mirror of the forward kernel (CPU branch + golden)."""
    N, Wp = y.shape
    B = N // T
    dt = y.dtype
    y3 = y.reshape(B, T, Wp)
    s1, sh1, cb = vecs[0], vecs[1], vecs[2]
    t1f = jnp.maximum(y3.astype(jnp.float32) * s1 + sh1, 0.0)
    zero = jnp.zeros_like(t1f[:, :1])
    prev = jnp.concatenate([zero, t1f[:, :-1]], axis=1)
    nxt = jnp.concatenate([t1f[:, 1:], zero], axis=1)
    G = Wp // LANE

    def tconv(h, tap):
        return jnp.einsum(
            "btgk,ko->btgo",
            h.astype(dt).reshape(B, T, G, LANE),
            tap,
            preferred_element_type=jnp.float32,
        ).reshape(B, T, Wp)

    y2f = tconv(prev, KB[0]) + tconv(t1f, KB[1]) + tconv(nxt, KB[2])
    y2 = (y2f + cb).astype(dt)
    y2r = y2.astype(jnp.float32)
    parts = jnp.stack(
        [jnp.sum(y2r, axis=1), jnp.sum(y2r * y2r, axis=1)], axis=1
    )  # (B, 2, Wp)
    return y2.reshape(N, Wp), parts


# ---------------------------------------------------------------------------
# backward: tconv transpose + ReLU mask + BN1 partials + tap gradients
# ---------------------------------------------------------------------------

def _bwd_kernel(dy2_ref, y_ref, vec_ref, kbt_ref, dpre_ref, part_ref, dkb_ref):
    """Transpose of the forward cell.

    dy2_ref: (T, TW) chain-dtype cotangent of the conv output (post-BN2
             backward).
    y_ref:   (T, TW) chain-dtype saved matmul output (t1 is recomputed, not
             stored).
    vec_ref: (4, TW) f32 rows [s1col, sh1col, 0, 0].
    kbt_ref: (3, 128, 128) chain-dtype TRANSPOSED taps.
    dpre_ref:(T, TW) chain-dtype d(pre-ReLU BN1 output) = mask*tconv^T(dy2).
    part_ref:(1, 2, TW) f32 per-column [sum(dpre), sum(dpre * y)].
    dkb_ref: (1, 1, 3, 128, 128) f32 per-cell tap-gradient partials
             dKB[s] = shift_s(t1)^T @ dy2 summed over this cell's groups.
    """
    dy2 = dy2_ref[...]
    y = y_ref[...]
    dt = y_ref.dtype
    T, TW = y.shape
    s1 = vec_ref[0:1, :]
    sh1 = vec_ref[1:2, :]
    rows = jax.lax.broadcasted_iota(jnp.int32, (T, LANE), 0)

    # full-width vector work first (see _fwd_kernel's Mosaic layout note)
    pre_full = y.astype(jnp.float32) * s1 + sh1
    t1_full = jnp.maximum(pre_full, 0.0).astype(dt)
    mask_full = pre_full > 0.0

    dpre_groups = []
    dkb = [jnp.zeros((LANE, LANE), jnp.float32) for _ in range(3)]
    for g in range(TW // LANE):
        sl = slice(g * LANE, (g + 1) * LANE)
        dg = dy2[:, sl]
        dgf = dg.astype(jnp.float32)
        zero = jnp.zeros_like(dgf)
        # dt1[r] = dy2[r+1] @ KB0^T + dy2[r] @ KB1^T + dy2[r-1] @ KB2^T
        d_nxt = jnp.where(rows == T - 1, zero, pltpu.roll(dgf, T - 1, axis=0))
        d_prev = jnp.where(rows == 0, zero, pltpu.roll(dgf, 1, axis=0))
        dt1 = (
            jnp.dot(d_nxt.astype(dt), kbt_ref[0],
                    preferred_element_type=jnp.float32)
            + jnp.dot(dg, kbt_ref[1], preferred_element_type=jnp.float32)
            + jnp.dot(d_prev.astype(dt), kbt_ref[2],
                      preferred_element_type=jnp.float32)
        )
        dpre_groups.append(dt1)
        # dKB[s] = shift_s(t1)^T @ dy2 (forward shifts: s=0 prev, 2 nxt)
        tgf = t1_full[:, sl].astype(jnp.float32)
        t_prev = jnp.where(rows == 0, jnp.zeros_like(tgf),
                           pltpu.roll(tgf, 1, axis=0))
        t_nxt = jnp.where(rows == T - 1, jnp.zeros_like(tgf),
                          pltpu.roll(tgf, T - 1, axis=0))
        contract = (((0,), (0,)), ((), ()))
        for s, th in enumerate((t_prev, tgf, t_nxt)):
            dkb[s] = dkb[s] + jax.lax.dot_general(
                th.astype(dt), dg, contract,
                preferred_element_type=jnp.float32,
            )
    dt1_full = (
        dpre_groups[0] if len(dpre_groups) == 1
        else jnp.concatenate(dpre_groups, axis=1)
    )
    dpre_full = jnp.where(mask_full, dt1_full, 0.0)
    dpre_ref[...] = dpre_full.astype(dt)
    part_ref[0, 0:1, :] = jnp.sum(dpre_full, axis=0, keepdims=True)
    part_ref[0, 1:2, :] = jnp.sum(
        dpre_full * y.astype(jnp.float32), axis=0, keepdims=True
    )
    for s in range(3):
        dkb_ref[0, 0, s] = dkb[s]


def _tconv_bwd(dy2, y, vecs, KBT, *, T, interpret=False):
    """Returns (dpre1 (N,Wp) chain dtype, parts (B,2,Wp) f32, dkb
    (3,128,128) f32).

    The per-cell tap partials are reduced to one (3,128,128) immediately
    (cell counts differ between the Pallas and jnp branches, and
    lax.platform_dependent requires identical avals)."""
    N, Wp = y.shape
    B = N // T
    TW = _pick_tile(Wp, y.dtype.itemsize)
    ncell = Wp // TW
    tile = pl.BlockSpec((T, TW), lambda b, j: (b, j), memory_space=pltpu.VMEM)
    dpre, parts, dkb = pl.pallas_call(
        _bwd_kernel,
        grid=(B, ncell),
        in_specs=[
            tile,
            tile,
            pl.BlockSpec((4, TW), lambda b, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, LANE, LANE), lambda b, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            tile,
            pl.BlockSpec((1, 2, TW), lambda b, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, LANE, LANE), lambda b, j: (b, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, Wp), y.dtype),
            jax.ShapeDtypeStruct((B, 2, Wp), jnp.float32),
            jax.ShapeDtypeStruct((B, ncell, 3, LANE, LANE), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=12 * N * Wp * LANE,
            bytes_accessed=3 * N * Wp * y.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(dy2, y, vecs, KBT)
    return dpre, parts, jnp.sum(dkb, axis=(0, 1))


def _tconv_bwd_ref(dy2, y, vecs, KBT, *, T):
    """Pure-jnp mirror of the backward kernel."""
    N, Wp = y.shape
    B = N // T
    G = Wp // LANE
    dt = y.dtype
    s1, sh1 = vecs[0], vecs[1]
    y3 = y.reshape(B, T, Wp)
    t1f = jnp.maximum(y3.astype(jnp.float32) * s1 + sh1, 0.0)
    mask = t1f > 0.0
    d3 = dy2.reshape(B, T, Wp).astype(jnp.float32)
    zero = jnp.zeros_like(d3[:, :1])
    d_nxt = jnp.concatenate([d3[:, 1:], zero], axis=1)
    d_prev = jnp.concatenate([zero, d3[:, :-1]], axis=1)

    def tconv(h, tap):
        return jnp.einsum(
            "btgk,ko->btgo",
            h.astype(dt).reshape(B, T, G, LANE),
            tap,
            preferred_element_type=jnp.float32,
        ).reshape(B, T, Wp)

    dt1 = (
        tconv(d_nxt, KBT[0])
        + tconv(d3, KBT[1])
        + tconv(d_prev, KBT[2])
    )
    dpre = jnp.where(mask, dt1, 0.0)
    parts = jnp.stack(
        [jnp.sum(dpre, axis=1), jnp.sum(dpre * y3.astype(jnp.float32), axis=1)],
        axis=1,
    )
    t_prev = jnp.concatenate([jnp.zeros_like(t1f[:, :1]), t1f[:, :-1]], axis=1)
    t_nxt = jnp.concatenate([t1f[:, 1:], jnp.zeros_like(t1f[:, :1])], axis=1)

    def dkb_of(th):
        return jnp.einsum(
            "btgk,btgo->bgko",
            th.astype(dt).reshape(B, T, G, LANE),
            d3.astype(dt).reshape(B, T, G, LANE),
            preferred_element_type=jnp.float32,
        )  # (B, G, 128, 128)

    dkb = jnp.stack([dkb_of(t_prev), dkb_of(t1f), dkb_of(t_nxt)], axis=2)
    return (
        dpre.reshape(N, Wp).astype(dt),
        parts,
        jnp.sum(dkb, axis=(0, 1)),
    )


# ---------------------------------------------------------------------------
# the block-level custom-VJP function
# ---------------------------------------------------------------------------

def _stats_from_cols(colsum, colsumsq, count, C):
    mean = _chan_sum(colsum, C) / count
    var = jnp.maximum(_chan_sum(colsumsq, C) / count - mean * mean, 0.0)
    return mean, var


@functools.lru_cache(maxsize=None)
def make_train_layer(residual, V, C, T, interpret=False, custom_vjp=True,
                     dtype=jnp.bfloat16):
    """Build the custom-VJP fused train layer for a static block config.

    Returned fn(x, M, bias_col, g1, b1, taps, cb, g2, b2) ->
        (out (B,T,Wp) chain dtype, mean1, var1, mean2, var2)  stats (C,) f32

    x: (B, T, W) in the chain ``dtype`` (bf16 or f32) — W may be the
    UNPADDED merged width when there is no residual (block 0), exactly like
    the fused eval chain's entry.
    Stats outputs are for the running-average update only and are treated as
    non-differentiable (their cotangents are ignored, matching the module
    path where running stats are mutable variables outside the grad).
    """
    dt = jnp.dtype(dtype)

    def fwd_impl(x, M, bias_col, g1, b1, taps, cb, g2, b2):
        B, Tx, W = x.shape
        Wp = M.shape[1]
        N = B * Tx
        cnt = N * V
        # bias + bf16 cast ride the dot's output fusion: the f32 accumulator
        # never hits HBM.  BN1 statistics are computed from the ROUNDED y —
        # exactly the values the kernel then normalizes (and two fewer 85 MB
        # HBM passes per block than reducing an f32 materialization).
        y = (
            jnp.einsum(
                "bti,io->bto", x, M[:W], preferred_element_type=jnp.float32
            )
            + bias_col
        ).astype(dt)
        yf = y.astype(jnp.float32)
        colsum1 = jnp.sum(yf, axis=(0, 1))
        colsumsq1 = jnp.sum(yf * yf, axis=(0, 1))
        mean1, var1 = _stats_from_cols(colsum1, colsumsq1, cnt, C)
        inv1 = jax.lax.rsqrt(var1 + _EPS)
        s1 = g1 * inv1
        s1col = _tile_cols(s1, V, C, Wp)
        sh1col = _tile_cols(b1 - mean1 * s1, V, C, Wp)
        cbcol = _tile_cols(cb, V, C, Wp)
        y = y.reshape(N, Wp)
        vecs = jnp.stack(
            [s1col, sh1col, cbcol, jnp.zeros_like(s1col)], axis=0
        )
        KB = _block_diag_taps(taps.astype(dt))
        if interpret:
            y2, parts = _tconv_stats_fwd(y, vecs, KB, T=T, interpret=True)
        else:
            y2, parts = jax.lax.platform_dependent(
                y, vecs, KB,
                tpu=lambda *a: _tconv_stats_fwd(*a, T=T),
                default=lambda *a: _tconv_stats_fwd_ref(*a, T=T),
            )
        colsum2 = jnp.sum(parts[:, 0], axis=0)
        colsumsq2 = jnp.sum(parts[:, 1], axis=0)
        mean2, var2 = _stats_from_cols(colsum2, colsumsq2, cnt, C)
        inv2 = jax.lax.rsqrt(var2 + _EPS)
        s2 = g2 * inv2
        s2col = _tile_cols(s2, V, C, Wp)
        sh2col = _tile_cols(b2 - mean2 * s2, V, C, Wp)
        y2f = y2.astype(jnp.float32).reshape(B, Tx, Wp)
        z = y2f * s2col + sh2col
        if residual:
            z = z + x.astype(jnp.float32)
        out = jnp.maximum(z, 0.0).astype(dt)
        saved = (
            x, y, y2, mean1, var1, mean2, var2, M, taps, g1, b1, g2, b2,
        )
        return (out, mean1, var1, mean2, var2), saved

    def bwd_impl(saved, cts):
        dout = cts[0].astype(jnp.float32)  # stats cotangents ignored
        (x, y, y2, mean1, var1, mean2, var2, M, taps, g1, b1, g2, b2) = saved
        B, Tx, W = x.shape
        Wp = M.shape[1]
        N = B * Tx
        cnt = N * V
        inv1 = jax.lax.rsqrt(var1 + _EPS)
        inv2 = jax.lax.rsqrt(var2 + _EPS)
        s1col = _tile_cols(g1 * inv1, V, C, Wp)
        sh1col = _tile_cols(b1 - mean1 * g1 * inv1, V, C, Wp)
        s2col = _tile_cols(g2 * inv2, V, C, Wp)
        sh2col = _tile_cols(b2 - mean2 * g2 * inv2, V, C, Wp)
        m2col = _tile_cols(mean2, V, C, Wp)
        inv2col = _tile_cols(inv2, V, C, Wp)

        y2f = y2.astype(jnp.float32).reshape(B, Tx, Wp)
        z = y2f * s2col + sh2col
        if residual:
            z = z + x.astype(jnp.float32)
        dz = jnp.where(z > 0.0, dout, 0.0)

        # BN2 backward (per channel, live stats)
        sum_dz_c = _chan_sum(jnp.sum(dz, axis=(0, 1)), C)
        sum_dzy2_c = _chan_sum(jnp.sum(dz * y2f, axis=(0, 1)), C)
        dg2 = inv2 * (sum_dzy2_c - mean2 * sum_dz_c)
        db2 = sum_dz_c
        mdz_col = _tile_cols(sum_dz_c / cnt, V, C, Wp)
        mdzn2_col = _tile_cols(
            (sum_dzy2_c / cnt - mean2 * (sum_dz_c / cnt)) * inv2, V, C, Wp
        )
        n2 = (y2f - m2col) * inv2col
        dy2 = s2col * (dz - mdz_col - n2 * mdzn2_col)
        # the conv bias feeds straight into BN2, which absorbs per-channel
        # shifts: d loss/d cb == 0 EXACTLY (per channel, Σ dy2 telescopes
        # to s2*(Σdz - Σdz - mdzn2*Σn2) with Σn2 = 0 by definition of the
        # mean; the same redundancy exists in the reference's
        # Conv2d-before-BatchNorm).  Return the analytic zero instead of a
        # full-array reduce that can only ever produce rounding noise.
        dcb = jnp.zeros_like(g2)  # cb is (C,) f32 like g2
        dy2_b = dy2.astype(dt).reshape(N, Wp)

        vecs = jnp.stack(
            [s1col, sh1col, jnp.zeros_like(s1col), jnp.zeros_like(s1col)],
            axis=0,
        )
        KBT = jnp.transpose(
            _block_diag_taps(taps.astype(dt)), (0, 2, 1)
        )
        if interpret:
            dpre, parts, dkb = _tconv_bwd(
                dy2_b, y, vecs, KBT, T=T, interpret=True
            )
        else:
            dpre, parts, dkb = jax.lax.platform_dependent(
                dy2_b, y, vecs, KBT,
                tpu=lambda *a: _tconv_bwd(*a, T=T),
                default=lambda *a: _tconv_bwd_ref(*a, T=T),
            )
        dtaps = _fold_diag_blocks(dkb, C).astype(taps.dtype)

        # BN1 backward
        sum_dp_c = _chan_sum(jnp.sum(parts[:, 0], axis=0), C)
        sum_dpy_c = _chan_sum(jnp.sum(parts[:, 1], axis=0), C)
        dg1 = inv1 * (sum_dpy_c - mean1 * sum_dp_c)
        db1 = sum_dp_c
        mdp_col = _tile_cols(sum_dp_c / cnt, V, C, Wp)
        mdpn1_col = _tile_cols(
            (sum_dpy_c / cnt - mean1 * (sum_dp_c / cnt)) * inv1, V, C, Wp
        )
        m1col = _tile_cols(mean1, V, C, Wp)
        inv1col = _tile_cols(inv1, V, C, Wp)
        yf = y.astype(jnp.float32).reshape(B, Tx, Wp)
        n1 = (yf - m1col) * inv1col
        dpre_f = dpre.astype(jnp.float32).reshape(B, Tx, Wp)
        dyf = s1col * (dpre_f - mdp_col - n1 * mdpn1_col)
        dbias_col = jnp.sum(dyf, axis=(0, 1))
        dy_b = dyf.astype(dt)

        dx = jnp.einsum(
            "bto,io->bti", dy_b, M[:W], preferred_element_type=jnp.float32
        )
        if residual:
            dx = dx + dz
        dM = jnp.einsum(
            "bti,bto->io", x, dy_b, preferred_element_type=jnp.float32
        )
        if W < Wp:
            dM = jnp.pad(dM, ((0, Wp - W), (0, 0)))
        return (
            dx.astype(x.dtype),
            dM.astype(M.dtype),
            dbias_col,
            dg1, db1, dtaps, dcb, dg2, db2,
        )

    def plain(x, M, bias_col, g1, b1, taps, cb, g2, b2):
        out_tuple, _ = fwd_impl(x, M, bias_col, g1, b1, taps, cb, g2, b2)
        return out_tuple

    if not custom_vjp:
        # autodiff baseline for the VJP equivalence tests (CPU/ref branch
        # only — the Pallas calls themselves carry no JVP rule)
        return plain

    layer = jax.custom_vjp(plain)

    def layer_fwd(x, M, bias_col, g1, b1, taps, cb, g2, b2):
        return fwd_impl(x, M, bias_col, g1, b1, taps, cb, g2, b2)

    layer.defvjp(layer_fwd, bwd_impl)
    return layer
