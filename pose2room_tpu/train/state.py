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


def epoch_lr(base_lr, milestones, gamma, epoch):
    """MultiStepLR: base_lr * gamma^(#milestones <= epoch)."""
    passed = sum(1 for m in milestones for _ in [0] if epoch >= m)
    return base_lr * (gamma ** passed)


def make_optimizer(optim_cfg=None, clip_norm=-1):
    optim_cfg = optim_cfg or {}
    lr = float(optim_cfg.get("lr", 1e-3))
    betas = optim_cfg.get("betas", [0.9, 0.999])
    eps = float(optim_cfg.get("eps", 1e-8))
    weight_decay = float(optim_cfg.get("weight_decay", 0.0))
    clip_norm = float(optim_cfg.get("clip_norm", clip_norm))

    chain = []
    if clip_norm > 0:
        chain.append(optax.clip_by_global_norm(clip_norm))
    opt = optax.inject_hyperparams(optax.adamw)(
        learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay
    )
    chain.append(opt)
    return optax.chain(*chain), (len(chain) - 1)


def set_learning_rate(opt_state, lr, adamw_index):
    """Host-side epoch-boundary LR update (no recompile: lr is opt state)."""
    inner = opt_state[adamw_index]
    hyper = dict(inner.hyperparams)
    hyper["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    new_inner = inner._replace(hyperparams=hyper)
    return opt_state[:adamw_index] + (new_inner,) + opt_state[adamw_index + 1 :]


def _host_cpu_device():
    """The CPU device for host-side init, or None if only CPU exists anyway."""
    if jax.default_backend() == "cpu":
        return None
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


def create_train_state(model, rng, sample_input, optim_cfg=None):
    """Initialize params/batch_stats and the optimizer.

    All init math runs eagerly on the CPU backend when an accelerator is the
    default: tracing the forward (flax init) and the per-leaf optax init
    through a remote TPU compile path costs minutes of tiny compilations,
    while CPU-eager init takes seconds.  The caller transfers the finished
    state to the accelerator in one device_put (parallel.replicate).
    """
    cpu = _host_cpu_device()

    def build():
        variables = model.init({"params": rng, "mdn": rng}, sample_input, train=False)
        tx, adamw_index = make_optimizer(optim_cfg)
        opt_state = tx.init(variables["params"])
        state = TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=opt_state,
            step=jnp.zeros((), dtype=jnp.int32),
        )
        return state, tx, adamw_index

    if cpu is not None:
        with jax.default_device(cpu):
            return build()
    return build()
