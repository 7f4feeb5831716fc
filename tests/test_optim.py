"""Optimizer tests: freeze list, per-phase LR overrides, milestone schedule."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from pose2room_tpu.train.state import (
    make_optimizer,
    apply_lr_schedule,
    epoch_lr,
)


def _fake_params():
    return {
        "backbone": {"w": jnp.ones((4, 4)), "b": jnp.zeros(4)},
        "centervoting": {"w": jnp.ones((4, 4))},
        "detection": {"w": jnp.ones((4, 4))},
    }


def _fake_grads(params):
    return jax.tree.map(jnp.ones_like, params)


def test_freeze_zeroes_updates():
    params = _fake_params()
    tx, info = make_optimizer({"lr": 0.1}, freeze=("backbone",))
    opt_state = tx.init(params)
    updates, _ = tx.update(_fake_grads(params), opt_state, params)
    assert float(jnp.abs(updates["backbone"]["w"]).max()) == 0.0
    assert float(jnp.abs(updates["detection"]["w"]).max()) > 0.0


def test_phase_lr_override():
    params = _fake_params()
    tx, info = make_optimizer(
        {"lr": 0.1}, phase_specs={"detection": {"lr": 0.001}}
    )
    assert info.base_lrs == {"default": 0.1, "detection": 0.001}
    opt_state = tx.init(params)
    updates, _ = tx.update(_fake_grads(params), opt_state, params)
    # adam first step: update magnitude ~= lr regardless of grad scale
    assert abs(float(-updates["backbone"]["w"][0, 0]) - 0.1) < 1e-5
    assert abs(float(-updates["detection"]["w"][0, 0]) - 0.001) < 1e-7


def test_lr_schedule_applies_to_all_groups():
    params = _fake_params()
    tx, info = make_optimizer(
        {"lr": 0.1}, freeze=("centervoting",), phase_specs={"detection": {"lr": 0.01}}
    )
    opt_state = tx.init(params)
    opt_state = apply_lr_schedule(opt_state, 0.1, info)
    updates, _ = tx.update(_fake_grads(params), opt_state, params)
    assert abs(float(-updates["backbone"]["w"][0, 0]) - 0.01) < 1e-6
    assert abs(float(-updates["detection"]["w"][0, 0]) - 0.001) < 1e-7
    assert float(jnp.abs(updates["centervoting"]["w"]).max()) == 0.0


def test_epoch_lr_milestones():
    assert epoch_lr(1e-3, [80, 120, 160], 0.1, 0) == 1e-3
    assert abs(epoch_lr(1e-3, [80, 120, 160], 0.1, 80) - 1e-4) < 1e-12
    assert abs(epoch_lr(1e-3, [80, 120, 160], 0.1, 160) - 1e-6) < 1e-15


def test_bnm_momentum_schedule():
    """bnm_momentum reproduces the reference BNMomentumScheduler lambda
    (models/optimizers.py:54-58), returned as the flax keep-rate."""
    from pose2room_tpu.train.state import bnm_momentum

    bns = {
        "bn_momentum_init": 0.5,
        "bn_decay_rate": 0.5,
        "bn_decay_step": 20,
        "bn_momentum_max": 0.001,
    }
    for epoch in (0, 1, 19, 20, 39, 40, 100, 500):
        torch_m = max(0.5 * 0.5 ** (epoch // 20), 0.001)
        assert abs(bnm_momentum(bns, epoch) - (1.0 - torch_m)) < 1e-12
    # floor engages for large epochs
    assert bnm_momentum(bns, 500) == 1.0 - 0.001


def test_bn_momentum_threading_mlp():
    """MLP1x1's BatchNorm honours a non-default bn_momentum: the running
    mean after one train step is m*init + (1-m)*batch_mean."""
    from pose2room_tpu.models.layers import MLP1x1

    x = jnp.asarray(np.random.RandomState(0).randn(4, 16).astype(np.float32))
    for m in (0.9, 0.5):
        mod = MLP1x1([8], final_plain=False, bn_momentum=m)
        variables = mod.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        _, mutated = mod.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        # dense output batch mean (pre-BN activations)
        import flax.linen as nn

        dense = nn.Dense(8, use_bias=False)
        h = dense.apply(
            {"params": variables["params"]["dense0"]}, x
        )
        expect = m * 0.0 + (1 - m) * np.asarray(h, np.float32).mean(0)
        got = np.asarray(mutated["batch_stats"]["bn0"]["mean"], np.float32)
        np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_bn_momentum_threading_stgcn_fused_and_module():
    """STGCN (both fused_train and module paths) honours bn_momentum: the
    batch moment recovered from the EMA update, (new - m*old)/(1-m), is
    momentum-invariant — so two momenta must imply the same moment."""
    from pose2room_tpu.models.stgcn import STGCN

    x = jnp.asarray(
        np.random.RandomState(1).randn(2, 16, 53, 3).astype(np.float32)
    )
    for fused in (False, True):
        recovered = {}
        for m in (0.9, 0.4):
            mod = STGCN(
                n_seeds=8, num_frames=16, fused_train=fused, bn_momentum=m
            )
            variables = mod.init({"params": jax.random.PRNGKey(0)}, x, train=False)
            _, mutated = mod.apply(
                variables, x, train=True, mutable=["batch_stats"]
            )
            old = np.asarray(
                variables["batch_stats"]["gcn0"]["tcn_bn1"]["mean"], np.float32
            )
            new = np.asarray(
                mutated["batch_stats"]["gcn0"]["tcn_bn1"]["mean"], np.float32
            )
            recovered[m] = (new - m * old) / (1 - m)
        np.testing.assert_allclose(
            recovered[0.9], recovered[0.4], rtol=1e-4, atol=1e-5
        )
