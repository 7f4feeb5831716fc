"""Pre-folded eval operands (the serving configuration).

Re-folding the six graph matrices inside every generate call costs ~0.54 ms
of device time — 39% of the batch-1 step (BENCH_NOTES.md round-4 op
profile).  `P2RNet.fold_eval` / `make_fold_fn` compute the folded operands
once per weight load; `generate(folded=...)` must then produce BIT-IDENTICAL
outputs to the inline-fold path (the operands are the same traced arrays,
just computed in a separate jit), for both the dense and block-sparse eval
chains, and the fold must be invalidated-free: it is a pure function of the
weights.

Reference surface being accelerated: per-batch test/demo latency
(test_epoch.py:28-32, demo.py) — the reference re-runs its einsum-based
graph contraction per forward too (stgcn_layers.py:58-67); folding ahead of
time is only possible because our eval path folds A into the weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose2room_tpu.models import P2RNet, P2RNetConfig
from pose2room_tpu.models.p2rnet import P2RNet as P2R
from pose2room_tpu.train.state import create_train_state
from pose2room_tpu.train.step import make_fold_fn, make_generate_fn


def _small_cfg(**kw):
    return P2RNetConfig(
        num_frames=96, num_seeds=64, num_proposals=16, num_gaussian=10, **kw
    )


@pytest.mark.parametrize("sparse", [False, True])
@pytest.mark.parametrize("dtype", ["bfloat16", "float32"])
def test_folded_generate_matches_inline(rng, sparse, dtype):
    cfg = _small_cfg(compute_dtype=dtype, sparse_eval=sparse)
    model = P2RNet(config=cfg)
    key = jax.random.PRNGKey(0)
    x = rng.randn(2, cfg.num_frames, 53, 3).astype(np.float32) * 0.5
    variables = model.init({"params": key, "mdn": key}, x[:1], train=False)

    folded = jax.jit(lambda v: model.apply(v, method=P2R.fold_eval))(variables)
    # 6 blocks x (M|tiles, vecs, KB)
    assert len(folded) == 18

    # the fold itself is deterministic across separate jits: the operand
    # arrays are bit-exact however the fold is compiled.  This is the
    # anchor invariant; the end-output equality below additionally relies
    # on XLA not fusing the inline fold differently into its consumer.
    folded2 = jax.jit(
        lambda v: tuple(model.apply(v, method=P2R.fold_eval))
    )(variables)
    for a, b in zip(folded, folded2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    inline = jax.jit(
        lambda v, xx: model.apply(v, xx, method=P2R.generate)
    )(variables, x)
    pre = jax.jit(
        lambda v, xx, f: model.apply(v, xx, folded=f, method=P2R.generate)
    )(variables, x, folded)
    for k in ("center", "size", "heading", "objectness_scores",
              "sem_cls_scores", "seed_features"):
        # bit-identical today; compiler-dependent in principle (the inline
        # fold COULD fuse into its consumer under a future XLA).  If a
        # jaxlib bump ever breaks this, relax the OUTPUT check to a tight
        # allclose (the dryrun uses 1e-4) — the operand check above must
        # stay bit-exact.
        np.testing.assert_array_equal(
            np.asarray(inline[k], np.float32), np.asarray(pre[k], np.float32),
            err_msg=k,
        )


def test_make_fold_fn_and_generate_kwarg(rng):
    """The runner-facing pair: make_fold_fn(model)(state) feeds
    make_generate_fn(model)(state, x, folded=...) — equal to the inline
    path; and with fused_eval off the fold returns None (generate then
    ignores it)."""
    cfg = _small_cfg(compute_dtype="bfloat16")
    model = P2RNet(config=cfg)
    key = jax.random.PRNGKey(0)
    sample = np.zeros((1, cfg.num_frames, 53, 3), np.float32)
    state, _, _ = create_train_state(model, key, sample, {"lr": 1e-3})
    x = rng.randn(2, cfg.num_frames, 53, 3).astype(np.float32) * 0.5

    gen = make_generate_fn(model)
    folded = make_fold_fn(model)(state)
    assert folded is not None
    out_inline = gen(state, x)
    out_folded = gen(state, x, folded=folded)
    np.testing.assert_array_equal(
        np.asarray(out_inline["center"], np.float32),
        np.asarray(out_folded["center"], np.float32),
    )

    unfused = P2RNet(config=_small_cfg(compute_dtype="bfloat16",
                                       fused_eval=False))
    state_u, _, _ = create_train_state(unfused, key, sample, {"lr": 1e-3})
    assert make_fold_fn(unfused)(state_u) is None


def test_bake_folded_matches_runtime_arg(rng):
    """The demo runner's serving form: make_generate_fn(bake_folded=...)
    closure-captures the folded operands (XLA embeds them as executable
    constants, cross-program-prefetched — measured -2.8% on the batch-1
    step, BENCH_NOTES round-5).  Constants-vs-runtime-args must not change
    the math: outputs equal the runtime-arg form, and the baked fn ignores
    a (stale) folded argument.

    f32 on purpose: constants-vs-args legitimately changes XLA fusion, and
    under bf16 rounding that can flip near-tie FPS/ball-query selections
    (observed: 6/96 center elements O(1)-different — the same discrete
    reselection documented for f32-vs-bf16 eval in BENCH_NOTES round-2).
    In f32 the compiled math is fusion-stable and the equality is tight."""
    cfg = _small_cfg(compute_dtype="float32")
    model = P2RNet(config=cfg)
    key = jax.random.PRNGKey(0)
    sample = np.zeros((1, cfg.num_frames, 53, 3), np.float32)
    state, _, _ = create_train_state(model, key, sample, {"lr": 1e-3})
    x = rng.randn(2, cfg.num_frames, 53, 3).astype(np.float32) * 0.5

    folded = make_fold_fn(model)(state)
    out_arg = make_generate_fn(model)(state, x, folded=folded)
    baked = make_generate_fn(model, bake_folded=folded)
    out_baked = baked(state, x)
    # baked constants may be laid out/fused differently by XLA than runtime
    # args — allow layout-level rounding, not semantic drift
    np.testing.assert_allclose(
        np.asarray(out_arg["center"], np.float32),
        np.asarray(out_baked["center"], np.float32),
        rtol=1e-5, atol=1e-5,
    )
    # the folded kwarg is advertised as ignored when baked: passing
    # obviously-wrong operands must not change the output
    poisoned = tuple(jnp.zeros_like(f) for f in folded)
    out_poisoned = baked(state, x, folded=poisoned)
    np.testing.assert_array_equal(
        np.asarray(out_baked["center"], np.float32),
        np.asarray(out_poisoned["center"], np.float32),
    )
