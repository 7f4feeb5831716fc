"""Loss recording and TensorBoard logging.

Parity with reference net_utils/utils.py:296-405 (AverageMeter/LossRecorder/
LogBoard).  Cross-process metric aggregation: in the reference this is an
explicit NCCL all_reduce of (count, sum) (net_utils/utils.py:319-327); here
losses recorded from the sharded TRAIN jit are global means already (the
mean over the global batch axis rides ICI), so synchronizing them is
idempotent — but TEST-mode losses are computed per host over that host's
data shard, so ``synchronize_between_processes`` merges the raw (sum, count)
accumulators across processes via a host-object allgather
(parallel/collectives.py)."""


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

    def synchronize_between_processes(self, allgather=None):
        """Merge (sum, count) accumulators across processes.

        Reference semantics: net_utils/utils.py:319-327 all-reduces every
        meter's (count, total).  ``allgather`` is injectable for tests; the
        default rides jax multihost_utils (no-op list for single process).
        Idempotent when every host already holds identical global means.
        """
        if allgather is None:
            from pose2room_tpu.parallel.collectives import (
                allgather_object as allgather,
            )
        states = allgather(
            {k: (m.sum, m.count) for k, m in self.loss_recorder.items()}
        )
        if len(states) == 1:
            return
        merged = {}
        for st in states:
            for k, (s, c) in st.items():
                acc = merged.setdefault(k, [0.0, 0])
                acc[0] += s
                acc[1] += c
        for k, (s, c) in merged.items():
            m = self.loss_recorder.setdefault(k, AverageMeter())
            m.sum, m.count = s, c
            m.avg = s / max(c, 1)
            m.val = m.avg


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
