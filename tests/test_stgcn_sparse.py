"""Block-sparse folded graph-conv matmul (ops/stgcn_sparse.py).

Covers: the static tile lists (incl. the locked optimized-permutation tile
count), kernel-vs-golden equality in interpret mode, the sparse fold in
models/layers.py against the dense fold, and whole-backbone equality of
the sparse eval path vs the module path.  On-chip (Mosaic) correctness is
additionally gated inside bench.py's selfcheck, since interpret mode
cannot see lowering bugs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose2room_tpu.models.graph import SPARSE_JOINT_ORDER, build_spatial_graph
from pose2room_tpu.ops.stgcn_sparse import (
    gather_m_tiles,
    sparse_graph_matmul_bn_relu,
    sparse_graph_matmul_bn_relu_ref,
    sparse_tile_lists,
)

V, C, Wp = 53, 64, 3456


def _support():
    return (build_spatial_graph() != 0).any(0)


def test_sparse_joint_order_is_permutation():
    assert sorted(SPARSE_JOINT_ORDER.tolist()) == list(range(54))


def test_tile_counts():
    sup = _support()
    # each (v, w) pair lies in exactly one partition k (reference
    # stgcn_layers.py:182-205), so the union support == total nnz
    A = build_spatial_graph()
    assert (A != 0).sum() == sup.sum() == 971
    col_nat, vl_nat = sparse_tile_lists(sup, np.arange(54, dtype=np.int32))
    col_sa, vl_sa = sparse_tile_lists(sup, SPARSE_JOINT_ORDER)
    assert len(vl_nat) == 391  # natural pairing
    assert len(vl_sa) == 279  # optimized pairing (annealed; locked)
    for col, vl in ((col_nat, vl_nat), (col_sa, vl_sa)):
        assert col[0] == 0 and col[-1] == len(vl) and (np.diff(col) >= 0).all()
        assert vl.min() >= 0 and vl.max() < 27


def _operands(order, dtype, B=2, T=40, seed=0):
    rng = np.random.RandomState(seed)
    sup = _support()
    col_off, vlist = sparse_tile_lists(sup, order)
    s = np.zeros((54, 54), bool)
    s[:V, :V] = sup
    M = rng.randn(54, C, 54, C).astype(np.float32) * 0.1
    M *= s[:, None, :, None]
    Mp = M[np.ix_(order, np.arange(C), order, np.arange(C))].reshape(Wp, Wp)
    tiles = gather_m_tiles(Mp, col_off, vlist)
    pad_slot = int(np.where(np.asarray(order) == 53)[0][0])
    x = (rng.randn(B, T, Wp) * 0.5).astype(np.float32)
    x[..., pad_slot * C : (pad_slot + 1) * C] = 0
    vecs = np.zeros((8, Wp), np.float32)
    vecs[0] = rng.rand(Wp) + 0.5
    vecs[1] = rng.randn(Wp)
    vecs[:, pad_slot * C : (pad_slot + 1) * C] = 0
    j = jnp.asarray
    return (
        j(x.astype(dtype)), j(Mp.astype(dtype)), j(tiles.astype(dtype)),
        j(vecs), j(col_off), j(vlist), pad_slot,
    )


@pytest.mark.parametrize("order_name", ["natural", "sa"])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_kernel_matches_dense(order_name, dtype):
    order = (
        np.arange(54, dtype=np.int32) if order_name == "natural"
        else SPARSE_JOINT_ORDER
    )
    x, Mp, tiles, vecs, col_off, vlist, pad_slot = _operands(order, dtype)
    dense = np.maximum(
        np.asarray(x, np.float32).reshape(-1, Wp)
        @ np.asarray(Mp, np.float32)
        * np.asarray(vecs)[0]
        + np.asarray(vecs)[1],
        0,
    ).reshape(x.shape)
    got = sparse_graph_matmul_bn_relu(
        x, tiles, vecs, col_off, vlist, interpret=True
    )
    ref = sparse_graph_matmul_bn_relu_ref(x, tiles, vecs, col_off, vlist)
    tol = 5e-2 if dtype == jnp.bfloat16 else 1e-3
    np.testing.assert_allclose(
        np.asarray(got, np.float32), dense, atol=tol * np.abs(dense).max()
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=tol * np.abs(dense).max(),
    )
    # pad columns exactly zero
    assert np.abs(
        np.asarray(got)[..., pad_slot * C : (pad_slot + 1) * C].astype(np.float32)
    ).max() == 0.0


def test_kernel_ragged_rows():
    """Row counts that don't divide the chunk size (toy eval shapes)."""
    order = SPARSE_JOINT_ORDER
    x, Mp, tiles, vecs, col_off, vlist, _ = _operands(order, jnp.float32, B=1, T=96)
    got = sparse_graph_matmul_bn_relu(
        x, tiles, vecs, col_off, vlist, interpret=True
    )
    ref = sparse_graph_matmul_bn_relu_ref(x, tiles, vecs, col_off, vlist)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-3
    )


def test_fold_eval_arrays_sparse_matches_dense_fold():
    """The tile fold (layers.py) densifies to the dense fold's permuted M,
    and the permuted vectors match the dense fold's vectors."""
    from pose2room_tpu.models.layers import STGCNBlock

    order = SPARSE_JOINT_ORDER
    sup = _support()
    col_off, vlist = sparse_tile_lists(sup, order)
    wlist = np.repeat(
        np.arange(27, dtype=np.int32), np.diff(col_off).astype(np.int64)
    )
    A = jnp.asarray(build_spatial_graph())
    blk = STGCNBlock(out_channels=C, spatial_kernel_size=A.shape[0])
    x = jnp.zeros((1, 4, V, C))
    variables = blk.init({"params": jax.random.PRNGKey(1)}, x, A)
    # randomize params so the check is non-trivial
    rng = np.random.RandomState(2)
    variables = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.randn(*a.shape).astype(a.dtype) * 0.1),
        variables,
    )
    # BN running variances must stay positive (rsqrt in the affine fold)
    bs = jax.tree_util.tree_map(
        lambda a: jnp.abs(a) + 0.5, variables["batch_stats"]
    )
    variables = {**variables, "batch_stats": bs}

    def dense_fold(v):
        return blk.apply(v, A, method=STGCNBlock.fold_eval_arrays)

    def sparse_fold(v):
        return blk.apply(
            v, A, order, vlist, wlist,
            method=STGCNBlock.fold_eval_arrays_sparse,
        )

    M, vecs_d, KB_d = dense_fold(variables)
    tiles, vecs_s, KB_s = sparse_fold(variables)
    # densify tiles and compare against the joint-permuted dense M
    expand = (np.asarray(order)[:, None] * C + np.arange(C)[None]).reshape(-1)
    Mp = np.asarray(M)[np.ix_(expand, expand)]
    dense_from_tiles = np.zeros((27, 128, 27, 128), np.float32)
    dense_from_tiles[vlist, :, wlist, :] = np.asarray(tiles, np.float32)
    np.testing.assert_allclose(
        dense_from_tiles.reshape(Wp, Wp), Mp, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(vecs_s), np.asarray(vecs_d)[:, expand], atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(KB_s), np.asarray(KB_d), atol=0)


@pytest.mark.parametrize("dtype", [None, jnp.bfloat16])
def test_backbone_sparse_matches_module(dtype):
    """Whole-STGCN equality: sparse eval chain vs per-block module path."""
    from pose2room_tpu.models.stgcn import STGCN

    rng = np.random.RandomState(3)
    x = rng.randn(2, 96, V, 3).astype(np.float32) * 0.5
    x[..., 0] += np.linspace(0, 3, 96)[None, :, None]
    key = jax.random.PRNGKey(0)
    outs = {}
    for name, kw in [
        ("module", dict(fused_eval=False)),
        ("sparse", dict(fused_eval=True, sparse_eval=True)),
    ]:
        m = STGCN(num_frames=96, n_seeds=64, dtype=dtype, **kw)
        v = m.init({"params": key}, x[:1], train=False)
        out = jax.jit(lambda v, xx, m=m: m.apply(v, xx, train=False))(v, x)
        outs[name] = np.asarray(out["seed_features"], np.float32)
    scale = np.abs(outs["module"]).max()
    tol = 0.05 if dtype == jnp.bfloat16 else 2e-5
    assert np.abs(outs["sparse"] - outs["module"]).max() <= tol * scale


def test_pick_rows_scales_with_row_width():
    """The resident-row-chunk picker budgets by the ACTUAL row width: a
    wider-than-default merged layout (e.g. a bigger skeleton) must shrink
    the chunk so the double-buffered x block stays under the scoped-VMEM
    cap (regression: the budget once hardcoded Wp=3456)."""
    from pose2room_tpu.ops.stgcn_sparse import _pick_rows

    budget = 3_500_000
    for width in (3456, 6912, 11520, 23040):
        for itemsize in (2, 4):
            r = _pick_rows(10_000, width, itemsize)
            assert r % 128 == 0 and r >= 128
            if r > 128:  # above the floor, the block must fit the budget
                assert r * width * itemsize <= budget
    # default shapes unchanged by the fix
    assert _pick_rows(98304, 3456, 2) == 384
    assert _pick_rows(98304, 3456, 4) == 128
    # tiny row counts stay clamped to the padded row count
    assert _pick_rows(96, 3456, 4) == 128
