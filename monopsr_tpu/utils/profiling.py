"""Tracing and step-timing hooks.

The reference's observability is wall-clock step timing and GPU memory
summaries (ref: src/monopsr/core/trainer.py:92-94, 196-204,
evaluator.py:207-211); here the equivalents are jax.profiler traces
(viewable in TensorBoard/Perfetto) and a simple step timer.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir, enabled=True):
    """Captures a jax.profiler trace for the enclosed block."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling steps/sec + wall-time bookkeeping."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._start = time.time()
        self._count = 0

    def tick(self, n=1):
        self._count += n

    def rate(self):
        elapsed = time.time() - self._start
        return self._count / elapsed if elapsed > 0 else 0.0

    def lap(self):
        rate = self.rate()
        self.reset()
        return rate


def device_memory_stats():
    """Per-device memory stats where the backend exposes them."""
    stats = {}
    for device in jax.devices():
        try:
            stats[str(device)] = device.memory_stats()
        except (AttributeError, NotImplementedError):
            stats[str(device)] = None
    return stats
