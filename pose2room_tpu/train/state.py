"""Train state: params + batch stats + AdamW optimizer with milestone LR.

Optimizer parity with reference models/optimizers.py:41-94: AdamW (the
reference instantiates AdamW despite the config label 'Adam') with the YAML
lr/betas/eps/weight_decay, and a MultiStepLR schedule — lr is scaled by
gamma^(#milestones passed) at EPOCH granularity.  The learning rate is
injected as an optax hyperparameter so the host can set it once per epoch
without recompiling the step (the lr lives in the optimizer state).
"""

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


class OptimizerInfo:
    """Host-side optimizer metadata: position in the chain + base LRs."""

    def __init__(self, adamw_index, base_lrs):
        self.adamw_index = adamw_index
        self.base_lrs = base_lrs


def epoch_lr(base_lr, milestones, gamma, epoch):
    """MultiStepLR: base_lr * gamma^(#milestones <= epoch)."""
    passed = sum(1 for m in milestones for _ in [0] if epoch >= m)
    return base_lr * (gamma ** passed)


def bnm_momentum(bns_cfg, epoch):
    """BN momentum at an epoch under the reference's BNMomentumScheduler
    lambda (models/optimizers.py:54-58: ``max(init * rate**(epoch // step),
    floor)``, torch convention) — returned as the FLAX keep-rate
    ``1 - torch_momentum`` for P2RNetConfig.bn_momentum.

    Dormant in the reference's shipped recipe (load_bnm_scheduler is never
    called); activated here by a ``bnscheduler:`` config section with the
    same keys.  Applied at EPOCH granularity by train/engine.py — the
    handful of distinct values over a run means a handful of step
    recompiles, matching the reference's model.apply-per-epoch semantics.
    """
    torch_m = max(
        float(bns_cfg["bn_momentum_init"])
        * float(bns_cfg["bn_decay_rate"]) ** int(epoch // int(bns_cfg["bn_decay_step"])),
        float(bns_cfg["bn_momentum_max"]),
    )
    return 1.0 - torch_m


def _adamw(optim_cfg, lr):
    betas = optim_cfg.get("betas", [0.9, 0.999])
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=lr,
        b1=betas[0],
        b2=betas[1],
        eps=float(optim_cfg.get("eps", 1e-8)),
        weight_decay=float(optim_cfg.get("weight_decay", 0.0)),
    )


def make_optimizer(optim_cfg=None, clip_norm=-1, freeze=(), phase_specs=None):
    """AdamW (+ optional grad clipping) with freeze / per-phase overrides.

    * ``freeze``: top-level submodule names whose updates are zeroed
      (reference train.freeze + freeze_modules, models/network.py);
    * ``phase_specs``: {phase: {'lr': ...}} per-submodule optimizer overrides
      (reference load_optim_spec / find_optim_module, optimizers.py:22-39).
    """
    optim_cfg = optim_cfg or {}
    base_lr = float(optim_cfg.get("lr", 1e-3))
    clip_norm = float(optim_cfg.get("clip_norm", clip_norm))
    phase_specs = {k: v for k, v in (phase_specs or {}).items() if v}

    if freeze or phase_specs:

        def label_fn(params):
            def label_of(phase):
                if phase in freeze:
                    return "frozen"
                if phase in phase_specs:
                    return phase
                return "default"

            return {phase: jax.tree.map(lambda _: label_of(phase), sub)
                    for phase, sub in params.items()}

        transforms = {"default": _adamw(optim_cfg, base_lr)}
        if freeze:
            transforms["frozen"] = optax.set_to_zero()
        for phase, spec in phase_specs.items():
            transforms[phase] = _adamw(
                {**optim_cfg, **spec}, float(spec.get("lr", base_lr))
            )
        opt = optax.multi_transform(transforms, label_fn)
    else:
        opt = _adamw(optim_cfg, base_lr)

    chain = []
    if clip_norm > 0:
        chain.append(optax.clip_by_global_norm(clip_norm))
    chain.append(opt)
    base_lrs = {"default": base_lr}
    for phase, spec in phase_specs.items():
        base_lrs[phase] = float(spec.get("lr", base_lr))
    info = OptimizerInfo(adamw_index=len(chain) - 1, base_lrs=base_lrs)
    return optax.chain(*chain), info


def _map_inject_states(state, fn):
    """Recursively apply fn to every InjectHyperparamsState in an opt state."""
    if hasattr(state, "hyperparams") and isinstance(getattr(state, "hyperparams"), dict):
        return fn(state)
    if hasattr(state, "inner_states"):  # MultiTransformState
        new_inner = {
            k: _map_inject_states(v, fn) for k, v in state.inner_states.items()
        }
        return state._replace(inner_states=new_inner)
    if hasattr(state, "inner_state"):  # MaskedState / wrappers
        return state._replace(inner_state=_map_inject_states(state.inner_state, fn))
    if isinstance(state, tuple) and not hasattr(state, "_fields"):
        return tuple(_map_inject_states(s, fn) for s in state)
    return state


def apply_lr_schedule(opt_state, factor, info):
    """Set every AdamW's learning rate to base_lr * factor (host-side,
    epoch-boundary; no recompile — the LR lives in the optimizer state).
    All param groups follow the same schedule, as the reference MultiStepLR
    does (models/optimizers.py:41-52)."""
    inner = opt_state[info.adamw_index]
    if hasattr(inner, "inner_states"):  # multi_transform
        new_states = {}
        for label, sub in inner.inner_states.items():
            base = info.base_lrs.get(label)
            if base is None:  # frozen group: no LR to schedule
                new_states[label] = sub
            else:
                new_states[label] = _map_inject_states(
                    sub, lambda s, b=base: _set_lr(s, b * factor)
                )
        inner = inner._replace(inner_states=new_states)
    else:
        inner = _map_inject_states(
            inner, lambda s: _set_lr(s, info.base_lrs["default"] * factor)
        )
    return (
        opt_state[: info.adamw_index] + (inner,) + opt_state[info.adamw_index + 1 :]
    )


def _set_lr(inject_state, lr):
    hyper = dict(inject_state.hyperparams)
    hyper["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return inject_state._replace(hyperparams=hyper)


def set_learning_rate(opt_state, lr, adamw_index):
    """Back-compat single-optimizer LR setter."""
    info = OptimizerInfo(adamw_index, {"default": float(lr)})
    return apply_lr_schedule(opt_state, 1.0, info)


def _host_cpu_device():
    """The CPU device for host-side init, or None if only CPU exists anyway."""
    if jax.default_backend() == "cpu":
        return None
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


def create_train_state(model, rng, sample_input, optim_cfg=None, freeze=(), phase_specs=None):
    """Initialize params/batch_stats and the optimizer.

    All init math runs eagerly on the CPU backend when an accelerator is the
    default: tracing the forward (flax init) and the per-leaf optax init
    through a remote TPU compile path costs minutes of tiny compilations,
    while CPU-eager init takes seconds.  The caller transfers the finished
    state to the accelerator in one device_put (parallel.replicate).

    Returns (state, tx, info: OptimizerInfo).
    """
    cpu = _host_cpu_device()

    def build():
        variables = model.init({"params": rng, "mdn": rng}, sample_input, train=False)
        tx, info = make_optimizer(optim_cfg, freeze=freeze, phase_specs=phase_specs)
        opt_state = tx.init(variables["params"])
        state = TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=opt_state,
            step=jnp.zeros((), dtype=jnp.int32),
        )
        return state, tx, info

    if cpu is not None:
        with jax.default_device(cpu):
            return build()
    return build()
