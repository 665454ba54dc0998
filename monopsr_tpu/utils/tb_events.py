"""Minimal TensorBoard scalar-event sink.

The reference's observability artifact is TensorBoard scalars written
during training and evaluation (ref: src/monopsr/core/trainer.py:196-205,
core/summary_utils.py:69-86, core/evaluator_utils.py:294-403). The
JSONL logs remain the primary machine-readable sink; this writer mirrors
scalars into `events.out.tfevents.*` files so `tensorboard --logdir`
shows live loss/metric curves exactly as it does for the reference.

Backed by tensorboardX (in the base image). If it is unavailable the
writer degrades to a silent no-op so training never depends on it.
"""


class TBWriter:
    """Scalar-only TensorBoard event writer (no-op without tensorboardX).

    Args:
        logdir: event-file directory (usually <exp>/logs[/<split>]).
        enabled: config switch; False produces a no-op writer.
    """

    def __init__(self, logdir, enabled=True):
        self._writer = None
        if not enabled:
            return
        try:
            from tensorboardX import SummaryWriter
        except ImportError:
            return
        self._writer = SummaryWriter(logdir)

    def scalars(self, step, scalars):
        """Writes a dict of scalar values at `step`."""
        if self._writer is None:
            return
        for tag, value in scalars.items():
            try:
                self._writer.add_scalar(tag, float(value), int(step))
            except (TypeError, ValueError):
                continue
        self._writer.flush()

    def close(self):
        if self._writer is not None:
            self._writer.close()
            self._writer = None
