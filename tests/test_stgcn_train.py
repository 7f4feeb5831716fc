"""Fused ST-GCN TRAIN chain (ops/stgcn_train.py): kernels, VJP, module parity.

Pins down, on the CPU mesh:
* the forward/backward Pallas kernels (interpret mode) against their jnp
  mirrors — including the zero-padded-column invariant;
* the hand-written custom VJP against jax autodiff of the IDENTICAL forward
  (make_train_layer(custom_vjp=False) runs the same math through the
  differentiable jnp branch);
* the whole fused block against the module path (STGCNBlock.__call__ with
  live BN): outputs, updated running stats, and parameter gradients agree at
  bf16 level;
* one end-to-end train step with model.fused_train=True.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pose2room_tpu.ops.stgcn_train import (
    _block_diag_taps,
    _tconv_bwd,
    _tconv_bwd_ref,
    _tconv_stats_fwd,
    _tconv_stats_fwd_ref,
    make_train_layer,
)


V, C = 5, 64  # tiny joint count; W0=320 pads to Wp=384 (exercises padding)
W0, Wp = V * C, 384
T, B = 16, 2

# both chain dtypes since round 4 (f32: every rounding cast is a no-op, so
# kernel-vs-ref tolerances could be ~1e-6; the bf16 bounds stay valid)
DTYPES = [jnp.bfloat16, jnp.float32]


def _operands(rng, dt=jnp.bfloat16):
    y = np.zeros((B * T, Wp), np.float32)
    y[:, :W0] = rng.randn(B * T, W0) * 0.7
    vecs = np.zeros((4, Wp), np.float32)
    vecs[0, :W0] = 0.5 + rng.rand(W0)          # s1col
    vecs[1, :W0] = rng.randn(W0) * 0.3          # sh1col
    vecs[2, :W0] = rng.randn(W0) * 0.1          # cbcol
    taps = rng.randn(3, C, C).astype(np.float32) * 0.15
    KB = _block_diag_taps(jnp.asarray(taps, dt))
    return (
        jnp.asarray(y, dt),
        jnp.asarray(vecs),
        KB,
        taps,
    )


@pytest.mark.parametrize("dt", DTYPES, ids=["bf16", "f32"])
def test_fwd_kernel_matches_ref(rng, dt):
    y, vecs, KB, _ = _operands(rng, dt)
    tol = dict(atol=2e-2, rtol=2e-2) if dt == jnp.bfloat16 else dict(
        atol=1e-5, rtol=1e-5
    )
    y2_k, parts_k = _tconv_stats_fwd(y, vecs, KB, T=T, interpret=True)
    y2_r, parts_r = _tconv_stats_fwd_ref(y, vecs, KB, T=T)
    np.testing.assert_allclose(
        np.asarray(y2_k, np.float32), np.asarray(y2_r, np.float32), **tol
    )
    np.testing.assert_allclose(
        np.asarray(parts_k), np.asarray(parts_r),
        **(dict(atol=2e-1, rtol=2e-2) if dt == jnp.bfloat16
           else dict(atol=1e-3, rtol=1e-5))
    )
    # padded columns stay exactly zero
    assert np.abs(np.asarray(y2_k, np.float32)[:, W0:]).max() == 0.0
    assert np.abs(np.asarray(parts_k)[:, :, W0:]).max() == 0.0


@pytest.mark.parametrize("dt", DTYPES, ids=["bf16", "f32"])
def test_bwd_kernel_matches_ref(rng, dt):
    y, vecs, KB, _ = _operands(rng, dt)
    dy2 = jnp.asarray(
        np.pad(rng.randn(B * T, W0) * 0.5, ((0, 0), (0, Wp - W0))),
        dt,
    )
    KBT = jnp.transpose(KB, (0, 2, 1))
    bf = dt == jnp.bfloat16
    dp_k, parts_k, dkb_k = _tconv_bwd(dy2, y, vecs, KBT, T=T, interpret=True)
    dp_r, parts_r, dkb_r = _tconv_bwd_ref(dy2, y, vecs, KBT, T=T)
    np.testing.assert_allclose(
        np.asarray(dp_k, np.float32), np.asarray(dp_r, np.float32),
        **(dict(atol=2e-2, rtol=2e-2) if bf else dict(atol=1e-5, rtol=1e-5))
    )
    np.testing.assert_allclose(
        np.asarray(parts_k), np.asarray(parts_r),
        **(dict(atol=2e-1, rtol=2e-2) if bf else dict(atol=1e-3, rtol=1e-5))
    )
    np.testing.assert_allclose(
        np.asarray(dkb_k), np.asarray(dkb_r),
        **(dict(atol=5e-1, rtol=3e-2) if bf else dict(atol=1e-2, rtol=1e-4))
    )
    assert np.abs(np.asarray(dp_k, np.float32)[:, W0:]).max() == 0.0


def _layer_args(rng, residual, dt=jnp.bfloat16):
    x = np.zeros((B, T, Wp), np.float32)
    x[..., :W0] = rng.randn(B, T, W0) * 0.6
    M = np.zeros((Wp, Wp), np.float32)
    M[:W0, :W0] = rng.randn(W0, W0) * 0.04
    bias_col = np.zeros(Wp, np.float32)
    bias_col[:W0] = rng.randn(W0) * 0.1
    g1 = 0.7 + rng.rand(C).astype(np.float32)
    b1 = rng.randn(C).astype(np.float32) * 0.2
    taps = rng.randn(3, C, C).astype(np.float32) * 0.15
    cb = rng.randn(C).astype(np.float32) * 0.1
    g2 = 0.7 + rng.rand(C).astype(np.float32)
    b2 = rng.randn(C).astype(np.float32) * 0.2
    return (
        jnp.asarray(x, dt), jnp.asarray(M, dt),
        jnp.asarray(bias_col), jnp.asarray(g1), jnp.asarray(b1),
        jnp.asarray(taps), jnp.asarray(cb), jnp.asarray(g2), jnp.asarray(b2),
    )


@pytest.mark.parametrize("dt", DTYPES, ids=["bf16", "f32"])
@pytest.mark.parametrize("residual", [False, True])
def test_custom_vjp_matches_autodiff(rng, residual, dt):
    """Hand-written backward == jax autodiff of the identical forward."""
    args = _layer_args(rng, residual, dt)
    layer = make_train_layer(residual, V, C, T, dtype=dt.dtype.name)
    plain = make_train_layer(
        residual, V, C, T, custom_vjp=False, dtype=dt.dtype.name
    )

    out_c = layer(*args)
    out_p = plain(*args)
    for a, b in zip(out_c, out_p):
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)
        )

    w = jnp.asarray(rng.randn(B, T, Wp).astype(np.float32), dt)

    def loss_of(fn):
        def loss(*a):
            out = fn(*a)[0]
            return jnp.sum(out.astype(jnp.float32) * w.astype(jnp.float32))
        return loss

    argnums = tuple(range(9))
    g_c = jax.grad(loss_of(layer), argnums=argnums)(*args)
    g_p = jax.grad(loss_of(plain), argnums=argnums)(*args)
    names = ["x", "M", "bias_col", "g1", "b1", "taps", "cb", "g2", "b2"]
    db2_scale = max(np.abs(np.asarray(g_p[8])).max(), 1e-3)
    for name, a, b in zip(names, g_c, g_p):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        if name == "cb":
            # the conv bias feeds straight into BN2, which absorbs
            # per-channel shifts: the TRUE gradient is exactly zero (same
            # redundancy exists in the reference's Conv2d-before-BN).
            # Autodiff reports bf16-cotangent rounding noise around 0;
            # the hand-written f32 backward reports much smaller noise.
            # Assert both are noise relative to the b2-gradient scale.
            assert np.abs(a).max() < 2e-2 * db2_scale, np.abs(a).max()
            assert np.abs(b).max() < 0.3 * db2_scale, np.abs(b).max()
            continue
        # compare only the REAL region of padded operands: autodiff sees a
        # spurious gradient path through M/bias PAD columns into the BN
        # statistics (the columns are structurally zero and jnp.pad's VJP
        # drops those entries before they could reach any parameter); the
        # hand-written backward implements the intended function where pad
        # columns are inert
        if name == "M":
            a, b = a[:W0, :W0], b[:W0, :W0]
        elif name == "bias_col":
            a, b = a[:W0], b[:W0]
        elif name == "x":
            # pad columns also differ benignly: z==0 exactly there, and
            # autodiff's maximum(z, 0) tie convention passes gradient
            # through while the hand-written mask (z > 0) does not
            a, b = a[..., :W0], b[..., :W0]
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(
            a / scale, b / scale, atol=3e-2,
            err_msg=f"grad mismatch for {name}",
        )


@pytest.mark.parametrize("dt", DTYPES, ids=["bf16", "f32"])
def test_block_fused_train_matches_module(rng, dt):
    """Fused train path vs STGCNBlock module path: outputs, running stats,
    and parameter gradients at chain-dtype tolerance (full 53-joint width).

    bf16: the two paths round at different points (bf16 BN1 input on the
    fused path vs f32 on the module path).  f32: pure reassociation — but
    the module path's matmuls run at the blocks' f32 precision while the
    autodiff of its einsum may reassociate differently, so tolerances stay
    relative rather than exact.
    """
    from pose2room_tpu.models.graph import build_spatial_graph
    from pose2room_tpu.models.layers import STGCNBlock

    Vj, Cj, Tj, Bj = 53, 64, 16, 2
    A = jnp.asarray(build_spatial_graph(Vj, max_hop=5))
    K = A.shape[0]
    block = STGCNBlock(
        out_channels=Cj, spatial_kernel_size=K, in_channels=Cj,
        num_joints=Vj, residual=True, dtype=dt,
    )
    x4 = jnp.asarray(rng.randn(Bj, Tj, Vj, Cj).astype(np.float32) * 0.5)
    variables = block.init(jax.random.PRNGKey(0), x4, A, train=True)

    out_m, mut_m = block.apply(
        variables, x4, A, train=True, mutable=["batch_stats"]
    )
    hm = x4.astype(dt).reshape(Bj, Tj, Vj * Cj)
    out_f, mut_f = block.apply(
        variables, hm, A, Tj,
        method=STGCNBlock.apply_fused_train, mutable=["batch_stats"],
    )
    out_f4 = np.asarray(
        out_f[..., : Vj * Cj], np.float32
    ).reshape(Bj, Tj, Vj, Cj)
    out_m = np.asarray(out_m, np.float32)
    scale = max(np.abs(out_m).max(), 1e-3)
    np.testing.assert_allclose(out_f4 / scale, out_m / scale, atol=3e-2)

    flat_m = jax.tree_util.tree_leaves_with_path(mut_m)
    flat_f = jax.tree_util.tree_leaves_with_path(mut_f)
    assert [p for p, _ in flat_m] == [p for p, _ in flat_f]
    for (path, a), (_, b) in zip(flat_m, flat_f):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-2, rtol=2e-2,
            err_msg=str(path),
        )

    # parameter gradients
    w = jnp.asarray(rng.randn(Bj, Tj, Vj, Cj).astype(np.float32))

    def loss_module(params):
        out, _ = block.apply(
            {**variables, "params": params}, x4, A, train=True,
            mutable=["batch_stats"],
        )
        return jnp.sum(out.astype(jnp.float32) * w)

    def loss_fused(params):
        out, _ = block.apply(
            {**variables, "params": params}, hm, A, Tj,
            method=STGCNBlock.apply_fused_train, mutable=["batch_stats"],
        )
        out4 = out[..., : Vj * Cj].reshape(Bj, Tj, Vj, Cj)
        return jnp.sum(out4.astype(jnp.float32) * w)

    g_m = jax.grad(loss_module)(variables["params"])
    g_f = jax.grad(loss_fused)(variables["params"])
    ref_scale = float(
        np.abs(np.asarray(g_m["tcn_bn2"]["bias"], np.float32)).max()
    )
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_m),
        jax.tree_util.tree_leaves_with_path(g_f),
    ):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        if "tcn_conv" in str(path) and "bias" in str(path):
            # conv bias feeds straight into BN2 which absorbs per-channel
            # shifts — the true gradient is exactly zero; both paths report
            # only rounding noise (see test_custom_vjp's cb case)
            assert np.abs(a).max() < 0.3 * ref_scale
            assert np.abs(b).max() < 0.3 * ref_scale
            continue
        scale = max(np.abs(a).max(), 1e-3)
        err = np.abs(a - b) / scale
        # the two paths round at different points (bf16 BN1 input on the
        # fused path vs f32 on the module path), so isolated elements can
        # flip across a ReLU boundary and take an O(activation) gradient
        # difference — require the BULK to agree tightly and cap the
        # boundary-flip fraction
        frac_bad = float(np.mean(err > 7e-2))
        assert frac_bad < 0.02, (str(path), frac_bad, err.max())
        assert np.median(err) < 3e-2, (str(path), float(np.median(err)))
        assert err.max() < 0.5, (str(path), err.max())


def test_train_step_with_fused_train(rng):
    """One full train step with model.fused_train=True: finite losses,
    updated params and batch stats."""
    from pose2room_tpu.models import P2RNet, P2RNetConfig
    from pose2room_tpu.train.state import create_train_state
    from pose2room_tpu.train.step import make_train_step

    cfg = P2RNetConfig(
        num_frames=64, num_seeds=32, num_proposals=8, num_gaussian=8,
        compute_dtype="bfloat16", fused_train=True,
    )
    model = P2RNet(config=cfg)
    key = jax.random.PRNGKey(0)
    Bx = 2
    sample = np.zeros((Bx, 64, 53, 3), np.float32)
    state, tx, _ = create_train_state(model, key, sample, {"lr": 1e-3})

    batch = {
        "input_joints": rng.randn(Bx, 64, 53, 3).astype(np.float32) * 0.4,
        "center_label": rng.randn(Bx, 10, 3).astype(np.float32),
        "box_label_mask": (np.arange(10)[None] < 3)
        .astype(np.float32).repeat(Bx, 0),
        "size": rng.randn(Bx, 10, 3).astype(np.float32) * 0.2,
        "heading": rng.randn(Bx, 10, 2).astype(np.float32),
        "sem_cls_label": rng.randint(0, 22, (Bx, 10)).astype(np.int32),
        "vote_label": rng.randn(Bx, 64, 53, 9).astype(np.float32) * 0.1,
        "vote_label_mask": rng.randint(0, 2, (Bx, 64, 53)).astype(np.int32),
    }
    step = make_train_step(model, tx)
    # snapshot BEFORE the step: train_step donates the input state buffers
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
    bs0 = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), state.batch_stats
    )
    new_state, losses = step(state, batch, key)
    assert np.isfinite(float(losses["total"]))
    # params moved
    p1 = jax.tree_util.tree_leaves(new_state.params)[0]
    assert not np.allclose(p0, np.asarray(p1))
    # BN running stats updated on the fused path
    bs1 = new_state.batch_stats
    moved = [
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(bs0), jax.tree_util.tree_leaves(bs1)
        )
    ]
    assert any(moved)
