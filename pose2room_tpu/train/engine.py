"""Epoch-level training loop: train+val phases, logging, best/last checkpoints.

Parity with reference train_epoch.py:8-105: per-epoch train and val phases
with running loss means, console logging every ``print_step``, LR schedule
stepped per epoch, ``model_last_<e>`` every ``save_weight_step`` epochs and
``model_best`` on val-loss improvement.
"""

import time

import jax
import numpy as np

from pose2room_tpu.parallel import shard_batch
from pose2room_tpu.train.state import apply_lr_schedule
from pose2room_tpu.utils.logger import LossRecorder, LogBoard


def device_prefetch(batches, mesh, depth=2, h2d_dtype=None):
    """Double-buffered H2D staging: enqueue batch k+1's device transfer
    before batch k's step is dispatched, so input upload overlaps the
    previous step's compute (device_put is async).  On a directly-attached
    host this is nearly free; through a slow dev tunnel it converts
    step_time = transfer + compute into max(transfer, compute).

    ``h2d_dtype`` (e.g. 'float16', opt-in via ``train.h2d_dtype``) casts
    float32 TARGET arrays on the host before upload, cutting per-step
    transfer bytes; the jitted step casts back to float32 on device.
    ``input_joints`` is exempt: quantizing the model input can discretely
    flip FPS/ball-query selections, a far larger effect than the ~1e-3
    relative perturbation compression adds to the loss targets.  Keep it
    off entirely when exact reference numerics matter."""
    from collections import deque

    cast_to = np.dtype(h2d_dtype) if h2d_dtype else None

    def compress(k, x):
        if (
            cast_to is not None
            and k != "input_joints"
            and isinstance(x, np.ndarray)
            and x.dtype == np.float32
        ):
            return x.astype(cast_to)
        return x

    q = deque()
    for batch in batches:
        arrays = {
            k: compress(k, v) for k, v in batch.items() if k != "sample_idx"
        }
        q.append(shard_batch(arrays, mesh))
        if len(q) >= depth:
            yield q.popleft()
    while q:
        yield q.popleft()


def run_epoch(
    phase,
    epoch,
    loader,
    state,
    step_fn,
    mesh,
    rng_key,
    log_fn,
    print_step=10,
    board=None,
    profile_ctx=None,
    h2d_dtype=None,
):
    from pose2room_tpu.utils.profiling import StepTimer

    recorder = LossRecorder(loader.batch_size)
    timer = StepTimer()
    loader.set_epoch(epoch)
    n_batches = len(loader)

    # Metrics are fetched ONE STEP LATE: jax dispatch is async, so by the
    # time we block on step k's losses, step k+1's H2D transfer and launch
    # are already enqueued — the device stays busy across step boundaries.
    pending = None  # (it, losses_handle, step_no)

    def drain(entry):
        it, handle, step_no = entry
        losses = {k: float(v) for k, v in jax.device_get(handle).items()}
        timer.tick()
        recorder.update_loss(losses)
        if (it % print_step) == 0:
            log_fn(
                f"Process: Phase: {phase}. Epoch {epoch}: {it}/{n_batches}. "
                f"step {timer.mean_ms:.1f}ms. "
                f"Current loss: {dict((k, round(v, 5)) for k, v in losses.items())}."
            )
        if board is not None:
            board.update(losses, step_no, phase)

    # host-side step counter: int(state.step) would force a device sync
    host_step = int(state.step)
    for it, batch in enumerate(
        device_prefetch(iter(loader), mesh, h2d_dtype=h2d_dtype)
    ):
        rng = jax.random.fold_in(rng_key, epoch * 100000 + it)
        if profile_ctx is not None:
            profile_ctx.maybe_start(host_step)
        if phase == "train":
            state, losses = step_fn(state, batch, rng)
            host_step += 1
        else:
            losses = step_fn(state, batch, rng)
        if profile_ctx is not None:
            profile_ctx.maybe_stop(host_step)
        if pending is not None:
            drain(pending)
        pending = (it, losses, host_step)
    if pending is not None:
        drain(pending)
    return state, recorder


class ProfileWindow:
    """Captures a jax.profiler trace for steps [start, start+n)."""

    def __init__(self, logdir, start_step, n_steps):
        self.logdir = str(logdir)
        self.start_step = start_step
        self.end_step = start_step + n_steps
        self._active = False
        self._done = False

    def maybe_start(self, step):
        if not self._done and not self._active and step >= self.start_step:
            jax.profiler.start_trace(self.logdir)
            self._active = True

    def maybe_stop(self, step):
        if self._active and step + 1 >= self.end_step:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True


def train(
    cfg,
    model,
    state,
    tx,
    opt_info,
    train_loader,
    val_loader,
    checkpoint,
    mesh,
    start_epoch=0,
    min_loss=float("inf"),
):
    """Full training run. Returns the final state."""
    from pose2room_tpu.train.step import make_train_step, make_eval_step

    log = cfg.log_string
    origin = cfg.dataset_config.origin_joint_id
    train_step = make_train_step(model, tx, origin)
    eval_step = make_eval_step(model, origin)
    # BN-momentum schedule (reference BNMomentumScheduler, dormant by
    # default — only active when the config has a ``bnscheduler`` section).
    # Momentum is a module attribute, so a value change rebuilds the model
    # and re-jits the steps; the schedule plateaus after a few decays, so
    # this costs a handful of recompiles per run.
    bns_cfg = cfg.config.get("bnscheduler")
    current_bnm = getattr(model.config, "bn_momentum", None)

    total_epochs = cfg.config["train"]["epochs"]
    sched = cfg.config.get("scheduler", {})
    milestones = sched.get("milestones", [])
    gamma = sched.get("gamma", 0.1)
    base_lr = float(cfg.config.get("optimizer", {}).get("lr", 1e-3))
    log_cfg = cfg.config.get("log", {})
    print_step = log_cfg.get("print_step", 10)
    save_weight_step = log_cfg.get("save_weight_step", 50)
    board = LogBoard(enabled=cfg.is_main_process)

    seed = cfg.config.get("seed", 42)
    rng_key = jax.random.fold_in(jax.random.PRNGKey(seed), jax.process_index())
    h2d_dtype = cfg.config["train"].get("h2d_dtype")

    profile_steps = int(log_cfg.get("profile_steps", 0) or 0)
    profile_ctx = None
    if profile_steps > 0 and cfg.is_main_process:
        import os

        profile_dir = os.path.join(cfg.save_path, "profile")
        # skip the first (compile) steps; trace steady-state
        profile_ctx = ProfileWindow(profile_dir, start_step=3, n_steps=profile_steps)
        log(f"Profiling steps 3..{3 + profile_steps} -> {profile_dir}")

    for epoch in range(start_epoch, total_epochs):
        if bns_cfg:
            from pose2room_tpu.train.state import bnm_momentum
            import dataclasses

            flax_m = bnm_momentum(bns_cfg, epoch)
            if flax_m != current_bnm:
                current_bnm = flax_m
                model = type(model)(
                    config=dataclasses.replace(
                        model.config, bn_momentum=flax_m
                    )
                )
                train_step = make_train_step(model, tx, origin)
                # eval_step is NOT rebuilt: momentum only affects the
                # running-stat update inside the train step; eval applies
                # with train=False (running averages), so its compiled
                # program is identical and a rebuild would only waste a
                # remote compile per decay epoch
            # reference BNMomentumScheduler.show_momentum (torch convention)
            log(f"Current BN decay momentum :{1.0 - flax_m:f}.")
        factor = gamma ** sum(1 for m in milestones if epoch >= m)
        state = state.replace(
            opt_state=apply_lr_schedule(state.opt_state, factor, opt_info)
        )
        log(f"-- Epoch {epoch + 1}/{total_epochs}; lr = {base_lr * factor:.6g} --")
        start = time.time()

        state, train_rec = run_epoch(
            "train", epoch, train_loader, state, train_step, mesh,
            rng_key, log, print_step, board, profile_ctx,
            h2d_dtype=h2d_dtype,
        )
        _, val_rec = run_epoch(
            "val", epoch, val_loader, state, eval_step, mesh,
            rng_key, log, print_step, board, h2d_dtype=h2d_dtype,
        )
        log(f"Epoch {epoch + 1} elapsed: {time.time() - start:.2f}s")
        # jit losses over the globally-sharded batch are global means already,
        # so this is idempotent — kept so host-side counters stay correct if a
        # phase ever records shard-local values (reference train_epoch.py:83)
        for rec in (train_rec, val_rec):
            rec.synchronize_between_processes()
        for phase, rec in (("train", train_rec), ("val", val_rec)):
            log(f"Epoch {epoch + 1} mean {phase} losses: "
                f"{dict((k, round(v, 5)) for k, v in rec.means().items())}")

        eval_loss = val_rec.means().get("total", float("inf"))
        if ((epoch + 1) % save_weight_step) == 0:
            checkpoint.save(f"last_{epoch + 1}", state, epoch + 1, min_loss)
        if eval_loss < min_loss:
            min_loss = eval_loss
            checkpoint.save("best", state, epoch + 1, min_loss)
            log(f"Best VAL loss so far: {min_loss:.5f}")
    checkpoint.save("final", state, total_epochs, min_loss)
    board.close()
    return state
