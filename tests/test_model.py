"""Model-layer tests: shapes under jit, seed sampling, MDN invariants, overfit."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pose2room_tpu.models import P2RNet, P2RNetConfig, detection_loss
from pose2room_tpu.models.graph import build_spatial_graph
from pose2room_tpu.models.stgcn import arc_length_seed_inds, window_index_table


SMALL = P2RNetConfig(num_frames=96, num_seeds=64, num_proposals=16, num_gaussian=8)


@pytest.fixture(scope="module")
def model_and_vars():
    model = P2RNet(config=SMALL)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, SMALL.num_frames, 53, 3))
    variables = model.init({"params": key, "mdn": key}, x, train=False)
    return model, variables, x


def test_forward_shapes_jit(model_and_vars):
    model, variables, x = model_and_vars

    @jax.jit
    def fwd(v, x, rng):
        return model.apply(v, x, train=True, rngs={"mdn": rng}, mutable=["batch_stats"])

    out, mutated = fwd(variables, x, jax.random.PRNGKey(1))
    B, S, P = 2, SMALL.num_seeds, SMALL.num_proposals
    assert out["seed_skeleton"].shape == (B, S, 53, 3)
    assert out["seed_features"].shape == (B, S, 256)
    assert out["vote_xyz"].shape == (B, S, 3)
    assert out["center"].shape == (B, P, 3)
    assert out["size"].shape == (B, P, 3)
    assert out["heading"].shape == (B, P, 2)
    assert out["objectness_scores"].shape == (B, P, 2)
    assert out["sem_cls_scores"].shape == (B, P, 22)
    assert "batch_stats" in mutated
    # vote features are L2-normalized
    norms = jnp.linalg.norm(out["vote_features"], axis=2)
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-5)


def test_generate_deterministic(model_and_vars):
    model, variables, x = model_and_vars
    g1 = model.apply(variables, x, method=P2RNet.generate)
    g2 = model.apply(variables, x, method=P2RNet.generate)
    np.testing.assert_array_equal(np.asarray(g1["center"]), np.asarray(g2["center"]))
    assert set(g1["pi"].keys()) == {"center", "size", "heading"}
    # pi are sigmoid outputs
    assert float(jnp.min(g1["pi"]["center"])) >= 0.0
    assert float(jnp.max(g1["pi"]["center"])) <= 1.0


def test_graph_builder_invariants():
    A = build_spatial_graph(53, max_hop=5)
    assert A.shape == (11, 53, 53)  # 1 + 2*max_hop partitions
    # all partitions sum to the full normalized adjacency
    total = A.sum(0)
    # column-normalized: each column of the hop<=5 adjacency sums to 1 where reachable
    colsums = total.sum(0)
    np.testing.assert_allclose(colsums, 1.0, atol=1e-6)
    assert (A >= 0).all()


def test_arc_length_seed_inds():
    # straight-line trajectory with constant speed -> evenly spaced indices
    T, S = 32, 8
    traj = np.zeros((1, T, 3), dtype=np.float32)
    traj[0, :, 0] = np.arange(T)
    inds = np.asarray(arc_length_seed_inds(jnp.asarray(traj), S))[0]
    expect = np.round(np.linspace(0, T - 1, S)).astype(int)
    np.testing.assert_array_equal(inds, expect)

    # numpy port of the reference formula on a random walk
    rng = np.random.RandomState(0)
    traj = rng.randn(2, T, 3).astype(np.float32).cumsum(axis=1)
    inds = np.asarray(arc_length_seed_inds(jnp.asarray(traj), S))
    move = np.linalg.norm(np.diff(traj, axis=1), axis=2)
    cum = np.concatenate([np.zeros((2, 1)), move.cumsum(axis=1)], axis=1)
    step = cum[:, -1] / (S - 1)
    target = step[:, None] * np.arange(S)
    expect = np.argmin(np.abs(cum[:, :, None] - target[:, None, :]), axis=1)
    np.testing.assert_array_equal(inds, expect)


def test_window_index_table():
    w = window_index_table(10, 4)
    assert w.shape == (10, 4)
    assert w.min() == 0 and w.max() == 9
    np.testing.assert_array_equal(w[5], [3, 4, 5, 6])
    np.testing.assert_array_equal(w[0], [0, 0, 0, 1])


def test_mdn_predict_collapses_to_weighted_mu(model_and_vars):
    """With sigma -> 0 the sampled prediction equals the pi-weighted mu."""
    model, variables, x = model_and_vars
    import flax

    flat = flax.traverse_util.flatten_dict(variables["params"])
    for k in flat:
        if k[-1] == "log_sigma":
            flat[k] = jnp.full_like(flat[k], -30.0)
    params = flax.traverse_util.unflatten_dict(flat)
    v2 = {**variables, "params": params}
    out = model.apply(v2, x, train=False, rngs={"mdn": jax.random.PRNGKey(3)})
    gen = model.apply(v2, x, method=P2RNet.generate)
    np.testing.assert_allclose(
        np.asarray(out["center"]), np.asarray(gen["center"]), atol=1e-4
    )


def _synthetic_batch(rng, cfg, B=2):
    T, V = cfg.num_frames, 53
    joints = rng.randn(B, T, V, 3).astype(np.float32) * 0.1
    joints[..., 0] += np.linspace(0, 3, T)[None, :, None]
    gt = {
        "input_joints": jnp.asarray(joints),
        "center_label": jnp.asarray(rng.randn(B, 10, 3).astype(np.float32)),
        "box_label_mask": jnp.asarray(
            np.repeat((np.arange(10)[None, :] < 3).astype(np.float32), B, 0)
        ),
        "size": jnp.asarray(rng.randn(B, 10, 3).astype(np.float32) * 0.2),
        "heading": jnp.asarray(rng.randn(B, 10, 2).astype(np.float32)),
        "sem_cls_label": jnp.asarray(rng.randint(0, 22, (B, 10))),
        "vote_label": jnp.asarray(rng.randn(B, T, V, 9).astype(np.float32) * 0.1),
        "vote_label_mask": jnp.asarray(rng.randint(0, 2, (B, T, V))),
    }
    return gt


def test_loss_decreases_under_training():
    """A few Adam steps on a fixed batch reduce the loss (end-to-end grads)."""
    import optax

    tiny = P2RNetConfig(num_frames=48, num_seeds=32, num_proposals=8, num_gaussian=8)
    model = P2RNet(config=tiny)
    key0 = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key0, (2, tiny.num_frames, 53, 3))
    variables = model.init({"params": key0, "mdn": key0}, x0, train=False)
    rng = np.random.RandomState(0)
    batch = _synthetic_batch(rng, tiny)
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, key):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                batch["input_joints"],
                train=True,
                rngs={"mdn": key},
                mutable=["batch_stats"],
            )
            losses = detection_loss(out, batch)
            return losses["total"], (losses, mut["batch_stats"])

        (loss, (losses, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss

    # fixed MDN noise key: isolates gradient correctness from sampling noise
    key = jax.random.PRNGKey(7)
    losses = []
    for i in range(10):
        params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state, key)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_seed_sampling_branches():
    """linspace (n_seeds >= T) and 'random' sort-sample seed selection."""
    from pose2room_tpu.models.stgcn import STGCN

    # linspace: n_seeds == T -> identity indices
    m = STGCN(n_seeds=16, num_frames=16)
    x = jnp.zeros((2, 16, 53, 3))
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = m.apply(v, x, train=False)
    np.testing.assert_array_equal(
        np.asarray(out["seed_inds"]), np.tile(np.arange(16), (2, 1))
    )

    # random: sorted subset of frame indices, reproducible per key
    m = STGCN(n_seeds=8, num_frames=16, seed_sampling="random")
    v = m.init({"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(0)}, x, train=False)
    o1 = m.apply(v, x, train=False, rngs={"sampling": jax.random.PRNGKey(5)})
    o2 = m.apply(v, x, train=False, rngs={"sampling": jax.random.PRNGKey(5)})
    o3 = m.apply(v, x, train=False, rngs={"sampling": jax.random.PRNGKey(6)})
    inds = np.asarray(o1["seed_inds"])
    assert (np.diff(inds, axis=1) > 0).all()  # strictly increasing (no dup)
    assert inds.min() >= 0 and inds.max() < 16
    np.testing.assert_array_equal(inds, np.asarray(o2["seed_inds"]))
    assert not np.array_equal(inds, np.asarray(o3["seed_inds"]))


def test_seed_fps_sampling_path():
    """cluster_sampling='seed_fps': arc-length resampling of seed hips."""
    cfg = P2RNetConfig(
        num_frames=48, num_seeds=32, num_proposals=8, num_gaussian=8,
        cluster_sampling="seed_fps",
    )
    model = P2RNet(config=cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 48, 53, 3))
    v = model.init({"params": key, "mdn": key}, x, train=False)
    out = model.apply(v, x, method=P2RNet.generate)
    assert out["aggregated_vote_xyz"].shape == (2, 8, 3)
    inds = np.asarray(out["aggregated_vote_inds"])
    assert inds.min() >= 0 and inds.max() < cfg.num_seeds


def test_eval_nn_loss_matches_reference_port():
    """eval_nn_loss vs a per-sample nested-loop numpy port of the reference
    Trainer.eval_nn_loss (models/p2rnet/training.py:38-91)."""
    from pose2room_tpu.models.loss import eval_nn_loss

    rng = np.random.RandomState(3)
    B, K, K2, NC = 3, 6, 5, 22

    def huber(e, delta=1.0):
        a = np.abs(e)
        q = np.minimum(a, delta)
        return 0.5 * q ** 2 + delta * (a - q)

    end_points = {
        "center": rng.randn(B, K, 3).astype(np.float32),
        "size": rng.randn(B, K, 3).astype(np.float32) * 0.3,
        "heading": rng.randn(B, K, 2).astype(np.float32),
        "sem_cls_scores": rng.randn(B, K, NC).astype(np.float32),
    }
    n_valid = np.array([1, 3, K2])
    mask = (np.arange(K2)[None, :] < n_valid[:, None]).astype(np.float32)
    gt = {
        "center_label": rng.randn(B, K2, 3).astype(np.float32),
        "box_label_mask": mask,
        "size": rng.randn(B, K2, 3).astype(np.float32) * 0.3,
        "heading": rng.randn(B, K2, 2).astype(np.float32),
        "sem_cls_label": rng.randint(0, NC, (B, K2)).astype(np.int32),
    }

    # reference port: per-sample loop over the VALID (prefix) GT boxes
    l1 = l2 = 0.0
    assign = np.zeros((B, K), np.int64)
    for b in range(B):
        nv = int(n_valid[b])
        d = huber(
            end_points["center"][b][:, None, :] - gt["center_label"][b][:nv][None]
        ).sum(-1)  # (K, nv)
        l1 += d.min(1).sum()
        l2 += d.min(0).sum()
        assign[b] = d.argmin(1)
    l1 /= B * K + 1e-6
    l2 /= mask.sum() + 1e-6
    center = (l1 + l2) / 2
    gt_size = np.take_along_axis(gt["size"], assign[:, :, None], axis=1)
    size = huber(end_points["size"] - gt_size).mean(-1).mean()
    gt_head = np.take_along_axis(gt["heading"], assign[:, :, None], axis=1)
    heading = huber(end_points["heading"] - gt_head).mean(-1).mean()
    gt_cls = np.take_along_axis(gt["sem_cls_label"], assign, axis=1)
    logits = end_points["sem_cls_scores"]
    logp = logits - np.log(
        np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)
    ) - logits.max(-1, keepdims=True)
    ce = -np.take_along_axis(logp, gt_cls[..., None], axis=-1)[..., 0].mean()
    expect = {
        "total": 10 * center + 10 * size + 10 * heading + ce,
        "center_loss": center,
        "size_loss": size,
        "heading_loss": heading,
        "sem_cls_loss": ce,
        "centroid_reg_loss1": l1,
        "centroid_reg_loss2": l2,
    }

    got = jax.jit(eval_nn_loss)(
        {k: jnp.asarray(v) for k, v in end_points.items()},
        {k: jnp.asarray(v) for k, v in gt.items()},
    )
    assert set(got) == set(expect)
    for k in expect:
        np.testing.assert_allclose(
            float(got[k]), expect[k], rtol=1e-5, atol=1e-6, err_msg=k
        )
