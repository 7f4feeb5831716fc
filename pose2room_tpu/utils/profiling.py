"""Profiling: jax.profiler trace capture + per-step timing.

The reference's only instrumentation is wall-clock deltas
(train_epoch.py:87-91, test_epoch.py:28-32).  Here:
* ``StepTimer`` — rolling per-step latency (host-side, cheap);
* ``trace`` — context manager capturing a TensorBoard-viewable device trace
  (``tensorboard --logdir <dir>`` -> Profile tab), gated by config
  ``log.profile_steps > 0`` in the train engine;
* ``annotate`` — named trace spans (jax.profiler.TraceAnnotation).
"""

import contextlib
import time

import jax


class StepTimer:
    def __init__(self, window=50):
        self.window = window
        self.times = []
        self._last = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
            if len(self.times) > self.window:
                self.times.pop(0)
        self._last = now

    @property
    def mean_ms(self):
        return 1000.0 * sum(self.times) / len(self.times) if self.times else 0.0


@contextlib.contextmanager
def trace(logdir, enabled=True):
    """Capture a jax.profiler trace into ``logdir`` while the block runs."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named span inside a trace (shows up in the TensorBoard timeline)."""
    return jax.profiler.TraceAnnotation(name)
