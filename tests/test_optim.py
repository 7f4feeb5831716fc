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
