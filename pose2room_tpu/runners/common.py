"""Shared runner plumbing: environment init, model/state construction.

The reference spreads this across net_utils/utils.py:205-294 (initiate_
environment, load_device/load_model/load_trainer/...) — here it collapses to:
initialize multi-host jax if coordinator env vars are present, seed fold-in
per process, build the flax model from the YAML config through the registry,
and initialize (or restore) the train state.
"""

import os

import jax
import numpy as np

from pose2room_tpu.config import mount_external_config
from pose2room_tpu.registry import METHODS
from pose2room_tpu.models.p2rnet import P2RNetConfig
from pose2room_tpu.parallel import make_mesh, replicate
from pose2room_tpu.train.state import create_train_state
from pose2room_tpu.train.checkpoint import CheckpointIO


def initiate_environment(config):
    """Multi-host init + seeding (reference net_utils/utils.py:205-219).

    Also registers the CPU backend alongside the accelerator platform so
    parameter init can run eagerly on host (see train.state.init_variables).
    """
    try:
        platforms = jax.config.jax_platforms
        if platforms and "cpu" not in platforms.split(","):
            jax.config.update("jax_platforms", platforms + ",cpu")
    except Exception:
        pass
    if "JAX_COORDINATOR_ADDRESS" in os.environ and jax.process_count() == 1:
        try:
            jax.distributed.initialize()
        except Exception:
            pass
    seed = config.get("seed", 42)
    np.random.seed(seed + jax.process_index())
    return config


def build_model(cfg):
    method = cfg.config.get("method", "P2RNet")
    model_cls = METHODS.get(method)
    return model_cls(config=P2RNetConfig.from_cfg(cfg))


def setup(cfg, mode):
    """Returns (model, state, tx, opt_info, mesh, checkpoint, start_epoch, min_loss)."""
    mount_external_config(cfg)
    model = build_model(cfg)
    # device.model_parallel: optional tensor-parallel degree — a 2-D
    # ('data','model') mesh with large kernels sharded over 'model'
    # (beyond the reference's DP-only recipe; see parallel/mesh.py)
    tp = int(cfg.config.get("device", {}).get("model_parallel", 1) or 1)
    mesh = make_mesh(model_parallel=tp)

    mc = model.config
    sample = np.zeros((1, mc.num_frames, mc.num_joints, 3), dtype=np.float32)
    rng = jax.random.PRNGKey(cfg.config.get("seed", 42))
    freeze = tuple(cfg.config.get("train", {}).get("freeze", []) or [])
    phase_specs = {
        phase: spec.get("optim_spec")
        for phase, spec in cfg.config.get("model", {}).items()
        if isinstance(spec, dict) and spec.get("optim_spec")
    }
    state, tx, opt_info = create_train_state(
        model, rng, sample, cfg.config.get("optimizer", {}),
        freeze=freeze, phase_specs=phase_specs,
    )

    checkpoint = CheckpointIO(cfg.save_path, cfg.log_string)
    start_epoch, min_loss = 0, float("inf")

    if cfg.config.get("resume", False):
        path = checkpoint.find_resume_checkpoint()
        if path:
            cfg.log_string(f"Resuming from {path}")
            state, start_epoch, min_loss = checkpoint.load_into_state(path, state)
    elif cfg.config.get("finetune", False):
        weights = cfg.config.get("weight", [])
        for w in weights:
            cfg.log_string(f"Loading weights from {w}")
            state = checkpoint.load_weights(w, state)

    if tp > 1:
        from pose2room_tpu.parallel import shard_params

        state = shard_params(state, mesh)
    else:
        state = replicate(state, mesh)
    return model, state, tx, opt_info, mesh, checkpoint, start_epoch, min_loss
