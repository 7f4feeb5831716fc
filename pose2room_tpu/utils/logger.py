"""Loss recording and TensorBoard logging.

Parity with reference net_utils/utils.py:296-405 (AverageMeter/LossRecorder/
LogBoard).  Cross-process metric aggregation: in the reference this is an
explicit NCCL all_reduce of (count, sum); here per-batch loss dicts are
computed inside the jit over the GLOBALLY sharded batch, so every host sees
global means already — ``synchronize`` therefore only has to be a no-op kept
for API parity (multi-process aggregation of *host-side* metrics uses
``jax.experimental.multihost_utils`` when needed).
"""


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class LossRecorder:
    def __init__(self, batch_size=1):
        self.batch_size = batch_size
        self.loss_recorder = {}

    def update_loss(self, loss_dict):
        for key, value in loss_dict.items():
            if key not in self.loss_recorder:
                self.loss_recorder[key] = AverageMeter()
            self.loss_recorder[key].update(float(value), self.batch_size)

    def means(self):
        return {k: m.avg for k, m in self.loss_recorder.items()}

    def synchronize_between_processes(self):
        # global means are already computed inside the sharded jit step
        pass


class LogBoard:
    """TensorBoard scalar writer (lazy import; no-op if unavailable)."""

    def __init__(self, logdir="runs", enabled=True):
        self.writer = None
        if not enabled:
            return
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(logdir)
        except Exception:
            self.writer = None

    def update(self, value_dict, step, phase):
        if self.writer is None:
            return
        for key, value in value_dict.items():
            self.writer.add_scalar(f"{key}/{phase}", float(value), step)

    def close(self):
        if self.writer is not None:
            self.writer.close()
