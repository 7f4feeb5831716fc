"""Fused ST-GCN eval chain: kernel vs jnp reference vs module path.

The TPU eval path (ops/stgcn_fused.py) reorganizes each block into an XLA
matmul over a merged lane-padded layout plus a Pallas epilogue kernel.  On
CPU the same folded operands run through `stgcn_layer_merged_ref`, so these
tests pin down, on the 8-device CPU mesh:

* the Pallas kernel (interpret mode) against the jnp reference — exact;
* the merged fused chain against the per-block module path — bf16-level
  agreement (the two are reassociations of the same math with bf16
  rounding at different points);
* identical parameter trees with the fused path on and off (the fused
  init creates params through fold_eval_arrays, not __call__).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pose2room_tpu.models.stgcn import STGCN
from pose2room_tpu.ops.stgcn_fused import (
    fused_stgcn_layer,
    pad_merged,
    stgcn_layer_merged_ref,
)


def _layer_operands(rng, W0, C, Wp):
    x = np.zeros((2, 32, Wp), np.float32)
    x[..., :W0] = rng.randn(2, 32, W0) * 0.5
    M = np.zeros((Wp, Wp), np.float32)
    M[:W0, :W0] = rng.randn(W0, W0) * 0.05
    vecs = np.zeros((8, Wp), np.float32)
    vecs[0, :W0] = 1 + rng.rand(W0) * 0.2
    vecs[1, :W0] = rng.randn(W0) * 0.1
    vecs[2, :W0] = 1 + rng.rand(W0) * 0.2
    vecs[3, :W0] = rng.randn(W0) * 0.1
    K = rng.randn(3, C, C).astype(np.float32) * 0.1
    KB = np.zeros((3, 128, 128), np.float32)
    for s in range(3):
        for p in range(128 // C):
            KB[s, p * C : (p + 1) * C, p * C : (p + 1) * C] = K[s]
    return (
        jnp.asarray(x, jnp.bfloat16),
        jnp.asarray(M, jnp.bfloat16),
        jnp.asarray(vecs),
        jnp.asarray(KB, jnp.bfloat16),
    )


@pytest.mark.parametrize("residual", [False, True])
@pytest.mark.parametrize("W0,C", [(256, 64), (192, 64)])
def test_kernel_matches_merged_ref(residual, W0, C):
    rng = np.random.RandomState(0)
    Wp = pad_merged(W0)
    x, M, vecs, KB = _layer_operands(rng, W0, C, Wp)
    out_k = fused_stgcn_layer(
        x, M, vecs, KB, residual=residual, interpret=True
    )
    out_r = stgcn_layer_merged_ref(x, M, vecs, KB, residual=residual)
    np.testing.assert_allclose(
        np.asarray(out_k, np.float32),
        np.asarray(out_r, np.float32),
        atol=2e-2,
        rtol=2e-2,
    )
    # padded columns stay exactly zero (the chain-safety invariant)
    if Wp > W0:
        assert np.abs(np.asarray(out_k[..., W0:], np.float32)).max() == 0.0


def test_first_layer_accepts_unpadded_input():
    """Without a residual the layer contracts an UNPADDED merged input
    against M's first W0 rows — same result as feeding the padded form."""
    rng = np.random.RandomState(3)
    W0, C = 192, 64
    Wp = pad_merged(W0)
    x, M, vecs, KB = _layer_operands(rng, W0, C, Wp)
    out_pad = fused_stgcn_layer(
        x, M, vecs, KB, residual=False, interpret=True
    )
    out_nopad = fused_stgcn_layer(
        x[..., :W0], M, vecs, KB, residual=False, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(out_pad, np.float32), np.asarray(out_nopad, np.float32)
    )
    r_nopad = stgcn_layer_merged_ref(x[..., :W0], M, vecs, KB, residual=False)
    np.testing.assert_array_equal(
        np.asarray(out_nopad, np.float32), np.asarray(r_nopad, np.float32)
    )


def _run_backbone(fused, x):
    model = STGCN(
        n_seeds=32,
        num_frames=64,
        dtype=jnp.bfloat16,
        fused_eval=fused,
    )
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key}, x, train=False)
    out = model.apply(variables, x, train=False)
    return variables, out


def test_fused_chain_matches_module_path():
    """fused_eval=True (merged-ref branch on CPU) vs the per-block module
    path: same params, bf16-level output agreement."""
    rng = np.random.RandomState(1)
    x = rng.randn(2, 64, 53, 3).astype(np.float32) * 0.5
    v_fused, out_fused = _run_backbone(True, x)
    v_mod, out_mod = _run_backbone(False, x)

    # identical parameter trees regardless of which path created them
    flat_f = jax.tree_util.tree_leaves_with_path(v_fused)
    flat_m = jax.tree_util.tree_leaves_with_path(v_mod)
    assert [p for p, _ in flat_f] == [p for p, _ in flat_m]
    for (_, a), (_, b) in zip(flat_f, flat_m):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    np.testing.assert_array_equal(
        np.asarray(out_fused["seed_inds"]), np.asarray(out_mod["seed_inds"])
    )
    a = np.asarray(out_fused["seed_features"], np.float32)
    b = np.asarray(out_mod["seed_features"], np.float32)
    # two reassociations of the same bf16 math; tolerance covers the
    # different rounding points (module path BNs the f32 accumulator)
    np.testing.assert_allclose(a, b, atol=0.12, rtol=0.12)


def test_train_path_unchanged_by_flag():
    """train=True never takes the fused path regardless of the flag."""
    rng = np.random.RandomState(2)
    x = rng.randn(2, 64, 53, 3).astype(np.float32) * 0.5
    outs = []
    for fused in (True, False):
        model = STGCN(
            n_seeds=32, num_frames=64, dtype=jnp.bfloat16, fused_eval=fused
        )
        key = jax.random.PRNGKey(0)
        variables = model.init({"params": key}, x, train=False)
        out, _ = model.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        outs.append(np.asarray(out["seed_features"], np.float32))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_batchnormcompat_matches_flax_batchnorm():
    """BatchNormCompat must be drop-in for nn.BatchNorm: same variable
    names/shapes, same train-mode stats + running update, same eval math."""
    import flax.linen as nn
    from pose2room_tpu.models.layers import BatchNormCompat

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(4, 6, 5, 16).astype(np.float32))

    compat = BatchNormCompat(16)
    ref = nn.BatchNorm(
        use_running_average=False, momentum=0.9, dtype=jnp.float32
    )
    v_c = compat.init(jax.random.PRNGKey(0), x, train=True)
    v_r = ref.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v_c) == jax.tree_util.tree_structure(
        v_r
    )

    # seed distinct affine params into both
    scale = jnp.asarray(1 + 0.3 * rng.rand(16).astype(np.float32))
    bias = jnp.asarray(0.2 * rng.randn(16).astype(np.float32))
    for v in (v_c, v_r):
        v["params"]["scale"] = scale
        v["params"]["bias"] = bias

    y_c, m_c = compat.apply(v_c, x, train=True, mutable=["batch_stats"])
    y_r, m_r = ref.apply(v_r, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_r), atol=1e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(m_c["batch_stats"][k]),
            np.asarray(m_r["batch_stats"][k]),
            atol=1e-6,
        )

    # eval mode with the updated running stats
    v_c2 = {"params": v_c["params"], **m_c}
    ref_eval = nn.BatchNorm(
        use_running_average=True, momentum=0.9, dtype=jnp.float32
    )
    v_r2 = {"params": v_r["params"], **m_r}
    y_ce = compat.apply(v_c2, x, train=False)
    y_re = ref_eval.apply(v_r2, x)
    np.testing.assert_allclose(np.asarray(y_ce), np.asarray(y_re), atol=1e-5)


def test_temporalconv_matches_flax_conv():
    import flax.linen as nn
    from pose2room_tpu.models.layers import TemporalConv

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 8, 5, 12).astype(np.float32))
    ours = TemporalConv(12, 12, kernel_size=3)
    theirs = nn.Conv(12, kernel_size=(3, 1), padding=((1, 1), (0, 0)))
    v_o = ours.init(jax.random.PRNGKey(7), x)
    v_t = theirs.init(jax.random.PRNGKey(7), x)
    # identical param tree (names + shapes); share the weights
    v_t = {"params": {k: v_o["params"][k] for k in v_t["params"]}}
    np.testing.assert_allclose(
        np.asarray(ours.apply(v_o, x)),
        np.asarray(theirs.apply(v_t, x)),
        atol=1e-5,
    )
