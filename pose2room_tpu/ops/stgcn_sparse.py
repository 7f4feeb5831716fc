"""Block-sparse folded graph-conv matmul for the ST-GCN eval chain.

The folded graph conv (models/layers.py:_folded_graph_matrix) is a dense
(Wp, Wp) = (3456, 3456) matmul whose 64x64 joint blocks B[v,w] are zero
whenever hop(v,w) > max_hop: only 971 of 53*53 joint pairs are connected
(34.6%), because each (v,w) pair lies in exactly one spatial partition k
(reference stgcn_layers.py:165-207).  The dense form therefore spends
~2.6x the necessary MXU FLOPs in exchange for perfect tiling — the
round-3 op-profile measured it at ~98% of MXU peak but flagged the FLOP
multiple as the one unmeasured design branch (BENCH_NOTES.md "speed of
light").

This kernel keeps the MXU shape AND drops the zero work:

* The merged (v, c) layout is re-ordered by a precomputed JOINT
  PERMUTATION (graph.py:SPARSE_JOINT_ORDER) that pairs joints to minimize
  the number of 128x128 tiles containing any nonzero 64x64 block:
  391 -> 279 of 729 tiles for the default 53-joint skeleton (simulated
  annealing over pairings; the count is locked by tests/test_stgcn_sparse).
* Only the nonzero 128x128 tiles of the permuted M are materialized
  (packed (nnz, 128, 128), CSR-by-output-column), so the matmul does
  38% of the dense FLOPs.
* Grid = (row_chunks, 27 output tiles).  The x row-chunk (R, 3456) stays
  VMEM-resident across all output tiles (its index map is constant in the
  inner grid dim — a re-fetch per tile would be HBM-bound: ~105 flop/byte
  < the ~240 flop/byte the MXU needs at peak).  M tiles are manually
  double-buffer-DMA'd from HBM inside the per-column loop, so per-step
  DMA (32 KB) hides under the (R, 128) x (128, 128) matmuls.
* The BN1 affine + ReLU + cast epilogue runs on the accumulator in-VMEM
  (exactly stgcn_fused._graph_matmul_bn_relu's math: f32 accumulator,
  f32 affine, ReLU, cast to the chain dtype), so t1 reaches HBM once.

The output feeds the existing fused epilogue kernel (stgcn_fused.py),
which is joint-permutation-invariant: its temporal taps are identical
per joint and its per-column vectors are permuted by the caller
(models/layers.py:fold_eval_arrays(order=...)).

Zero-padding contract (same as stgcn_fused.py, now with the pad slot
mid-order): the pad joint's M rows/cols and all per-column vector entries
are zero, so pad columns stay exactly zero through the whole chain.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def sparse_tile_lists(pair_support, order):
    """CSR-by-output-tile lists of nonzero 128x128 tiles.

    pair_support: (V, V) bool — True where any A_k[v, w] can be nonzero.
    order: (Vp,) joint permutation (Vp = V padded to even; extra slots are
        pad joints with no support).

    Returns (col_off, vlist) numpy int32: for output tile w in [0, Vp//2),
    the input tiles with any support are vlist[col_off[w]:col_off[w+1]].
    """
    Vp = len(order)
    assert Vp % 2 == 0
    sup = np.zeros((Vp, Vp), dtype=bool)
    V = pair_support.shape[0]
    sup[:V, :V] = pair_support
    sup = sup[np.ix_(order, order)]
    tiles = sup.reshape(Vp // 2, 2, Vp // 2, 2).any(axis=(1, 3))  # (v_t, w_t)
    col_off = [0]
    vlist = []
    for w in range(Vp // 2):
        vs = np.where(tiles[:, w])[0]
        vlist.extend(vs.tolist())
        col_off.append(len(vlist))
    return (
        np.asarray(col_off, dtype=np.int32),
        np.asarray(vlist, dtype=np.int32),
    )


def gather_m_tiles(M_perm, col_off, vlist):
    """Pack the nonzero (128, 128) tiles of the permuted folded matrix.

    M_perm: (Wp, Wp), already joint-permuted on both axes.  Returns
    (nnz, 128, 128) in CSR-by-output-column order matching vlist.
    """
    Wp = M_perm.shape[0]
    G = Wp // LANE
    t = M_perm.reshape(G, LANE, G, LANE)
    wlist = np.repeat(
        np.arange(G, dtype=np.int32), np.diff(col_off).astype(np.int64)
    )
    return t[vlist, :, wlist, :]


def _pick_rows(n_rows, row_width, itemsize):
    """Largest row-chunk that keeps the resident x block under ~3.5 MB.

    Pallas DOUBLE-BUFFERS every auto-blocked operand across grid steps (the
    x block's index map changes over the outer row dim), so the block
    appears twice in the scoped-VMEM request — the measured 16 MB cap
    (ops/stgcn_fused.py) allows ~2x3.5 MB for x plus out/acc/mbuf with
    margin.  Total x HBM traffic is R-independent (each chunk is fetched
    once), and (512, 128) x (128, 128) tap matmuls still amortize the
    32 KB M-tile DMAs, so a smaller R costs only a little loop overhead.
    """
    budget = 3_500_000
    r = min(1024, budget // (row_width * itemsize))
    r = max(LANE, (r // LANE) * LANE)
    return min(r, max(LANE, ((n_rows + LANE - 1) // LANE) * LANE))


def _kernel(col_off_ref, vlist_ref, x_ref, m_hbm, vec_ref, out_ref,
            acc_ref, mbuf, sem):
    w = pl.program_id(1)
    lo = col_off_ref[w]
    n = col_off_ref[w + 1] - lo

    def dma(slot, j):
        return pltpu.make_async_copy(
            m_hbm.at[lo + j], mbuf.at[slot], sem.at[slot]
        )

    @pl.when(n > 0)
    def _():
        dma(0, 0).start()

    acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(j, carry):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n)
        def _():
            dma(jax.lax.rem(j + 1, 2), j + 1).start()

        dma(slot, j).wait()
        v = vlist_ref[lo + j]
        xb = x_ref[:, pl.ds(pl.multiple_of(v * LANE, LANE), LANE)]
        acc_ref[...] += jnp.dot(
            xb, mbuf[slot], preferred_element_type=jnp.float32
        )
        return carry

    jax.lax.fori_loop(0, n, body, 0)
    vec = vec_ref[...]
    out_ref[...] = jnp.maximum(
        acc_ref[...] * vec[0:1, :] + vec[1:2, :], 0.0
    ).astype(out_ref.dtype)


def sparse_graph_matmul_bn_relu(x, m_tiles, vecs, col_off, vlist,
                                *, interpret=False):
    """relu((x @ M) * s1 + b1).astype(x.dtype) with block-sparse M.

    Args:
        x: (B, T, Wp) chain dtype (bf16 or f32), joint-PERMUTED merged
            layout, pad columns zero.
        m_tiles: (nnz, 128, 128) chain dtype — packed nonzero tiles of the
            permuted folded matrix (gather_m_tiles order).
        vecs: (8, Wp) f32 — rows [s1, b1', ...] (only rows 0-1 used here),
            joint-permuted, pad entries zero.
        col_off: (Wp//128 + 1,) int32; vlist: (nnz,) int32 — CSR tile lists
            (static data from sparse_tile_lists, passed as arrays for
            scalar prefetch).
    Returns:
        (B, T, Wp) in x.dtype.
    """
    B, T, Wp = x.shape
    assert Wp % LANE == 0
    G = Wp // LANE
    n_rows = B * T
    R = _pick_rows(n_rows, Wp, x.dtype.itemsize)
    xm = x.reshape(n_rows, Wp)
    grid = (pl.cdiv(n_rows, R), G)
    out = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                # resident row chunk: constant in the inner (column) grid
                # dim, so it is fetched once per row chunk
                pl.BlockSpec(
                    (R, Wp), lambda m, w, *_: (m, 0), memory_space=pltpu.VMEM
                ),
                # packed tiles stay in HBM; the kernel DMAs per tile
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(
                    (8, LANE), lambda m, w, *_: (0, w), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (R, LANE), lambda m, w, *_: (m, w), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((R, LANE), jnp.float32),
                pltpu.VMEM((2, LANE, LANE), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_rows, Wp), x.dtype),
        cost_estimate=pl.CostEstimate(
            # every packed tile contributes one (n_rows, 128) x (128, 128)
            # matmul regardless of which output column it belongs to
            flops=2 * n_rows * int(vlist.shape[0]) * LANE * LANE,
            bytes_accessed=(
                2 * n_rows * Wp * x.dtype.itemsize
                + int(vlist.shape[0]) * LANE * LANE * x.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(col_off, vlist, xm, m_tiles, vecs)
    return out.reshape(B, T, Wp)


def densify_tiles(m_tiles, vlist, wlist, G):
    """Reconstruct the dense (G*128, G*128) permuted matrix from packed
    tiles — the single inverse of gather_m_tiles (shared by the jnp golden
    below and the non-TPU fallback in models/stgcn.py, so a CSR-layout
    change cannot silently diverge between them).  vlist/wlist must be
    concrete (static) index lists."""
    dense = jnp.zeros((G, LANE, G, LANE), m_tiles.dtype)
    dense = dense.at[vlist, :, wlist, :].set(m_tiles)
    return dense.reshape(G * LANE, G * LANE)


def sparse_graph_matmul_bn_relu_ref(x, m_tiles, vecs, col_off, vlist):
    """Pure-jnp golden: densify the tiles and run the fused-chain math."""
    B, T, Wp = x.shape
    G = Wp // LANE
    wlist = np.repeat(
        np.arange(G, dtype=np.int32), np.diff(np.asarray(col_off))
    )
    dense = densify_tiles(m_tiles, np.asarray(vlist), wlist, G)
    y = jnp.einsum(
        "bti,io->bto", x, dense, preferred_element_type=jnp.float32
    )
    return jnp.maximum(y * vecs[0][None, None] + vecs[1][None, None], 0.0).astype(
        x.dtype
    )
