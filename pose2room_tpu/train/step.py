"""Jitted train/eval steps.

The whole reference hot loop (models/training.py:25-43 ->
p2rnet/training.py:100-121 -> loss.py:152) collapses into one compiled XLA
program per step: forward, loss, backward, AdamW update, metric means.  With
the batch sharded over the ('data',) mesh and params replicated, XLA inserts
the gradient all-reduce (the DDP equivalent) and the metric means are global
automatically.
"""

import functools

import jax
import jax.numpy as jnp

from pose2room_tpu.models.loss import detection_loss
from pose2room_tpu.train.state import TrainState

GT_KEYS = (
    "center_label",
    "box_label_mask",
    "size",
    "heading",
    "sem_cls_label",
    "vote_label",
    "vote_label_mask",
)


def _decompress(batch):
    """Cast H2D-compressed (float16) arrays back to float32 on device — the
    inverse of engine.device_prefetch's opt-in transfer compression."""
    return {
        k: v.astype(jnp.float32) if v.dtype == jnp.float16 else v
        for k, v in batch.items()
    }


def _gt_arrays(batch):
    return {k: batch[k] for k in GT_KEYS if k in batch}


def make_train_step(model, tx, origin_joint_id=0, log_grad_norm=True):
    import optax

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, rng):
        batch = _decompress(batch)
        gt = _gt_arrays(batch)

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["input_joints"],
                train=True,
                rngs={"mdn": rng},
                mutable=["batch_stats"],
            )
            losses = detection_loss(out, gt, origin_joint_id)
            return losses["total"], (losses, mut["batch_stats"])

        (_, (losses, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        if log_grad_norm:
            losses["grad_norm"] = optax.global_norm(grads)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, losses

    return train_step


def make_eval_step(model, origin_joint_id=0):
    """Validation loss step: forward (train-path MDN sampling disabled batch
    stats update; running averages used) + loss."""

    @jax.jit
    def eval_step(state: TrainState, batch, rng):
        batch = _decompress(batch)
        gt = _gt_arrays(batch)
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["input_joints"],
            train=False,
            rngs={"mdn": rng},
        )
        return detection_loss(out, gt, origin_joint_id)

    return eval_step


def make_fold_fn(model):
    """Jitted weight-only fold of the fused-eval graph operands.

    Re-folding the six (3392, 3392) graph matrices inside every generate
    call costs ~0.54 ms of device time (39% of the batch-1 step — profiled
    in BENCH_NOTES.md round-4); weights are fixed at serving time, so the
    runners call this ONCE per weight load and pass the result to the
    generate fn's ``folded`` argument.  Returns () when the fused eval path
    is disabled/unfusable — pass None to generate in that case (both are
    equivalent; the per-call inline fold is then used).

    CONTRACT: the folded operands are a pure function of the state they
    were folded from — they carry no link back to it, so passing a stale
    fold together with a LATER state to ``generate(folded=...)`` silently
    mixes old graph/BN operands with new weights.  Re-fold after every
    weight change (all current callers fold once per weight load; an
    in-training-eval caller must re-fold per eval).  The same note is on
    P2RNet.generate.
    """
    from pose2room_tpu.models.p2rnet import P2RNet

    @jax.jit
    def fold(state: TrainState):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            method=P2RNet.fold_eval,
        )

    def fold_or_none(state):
        folded = fold(state)
        return folded if folded else None

    return fold_or_none


def make_generate_fn(model, multi_mode=False, n_samples=1, bake_folded=None):
    """Jitted inference returning the full end_points dict.

    Deterministic (MDN get_mean) by default; with ``multi_mode`` the mixture
    modes are Bernoulli-sampled ``n_samples`` times and averaged (the
    reference's multi-modal generation path, proposal_net.py:239-241).

    ``folded``: optional precomputed make_fold_fn(model)(state) operands —
    the serving configuration; omitting it folds inline each call.

    ``bake_folded``: same operands, but closure-captured at trace time —
    XLA then embeds the six (3456, 3456) graph matrices as executable
    CONSTANTS and cross-program-prefetches them, measured -2.8% on the
    batch-1 demo step (BENCH_NOTES round-5).  The returned fn then ignores
    its ``folded`` argument, and the make_fold_fn staleness contract moves
    up a level: re-call make_generate_fn after every weight change (the
    demo runner does — it jits once per weight load anyway).
    """
    from pose2room_tpu.models.p2rnet import P2RNet

    if multi_mode:

        @jax.jit
        def generate(state: TrainState, input_joints, rng, folded=None):
            if bake_folded is not None:
                folded = bake_folded
            return model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                input_joints,
                multi_mode=True,
                n_samples=n_samples,
                folded=folded,
                method=P2RNet.generate,
                rngs={"mdn": rng},
            )

    else:

        @jax.jit
        def generate(state: TrainState, input_joints, rng=None, folded=None):
            if bake_folded is not None:
                folded = bake_folded
            return model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                input_joints,
                folded=folded,
                method=P2RNet.generate,
            )

    return generate
