"""Batched device->host pull pipeline for evaluation loops.

The remote-TPU transport charges a high fixed latency per transfer, so
pulling each sample's outputs individually dominates end-to-end
evaluation time. This pipeline accumulates dispatched step outputs and
pulls K of them in ONE packed transfer (utils.transfer concatenates the
whole list of output trees into a single byte buffer), on a background
thread so host-side formatting/saving overlaps the next batch's device
compute and transfer.

Used by eval.evaluator and bench.py so both measure/run the same path.
"""

import queue as queue_lib
import threading

from monopsr_tpu import constants as C
from monopsr_tpu.utils import transfer


def slot_bucket(samples, slot_buckets, num_boxes):
    """Smallest configured slot bucket covering every sample's num_objs.

    Buckets bound recompiles (one program per bucket) while letting
    sparse frames pull far fewer per-box output bytes than the full
    num_boxes slots. Shared by the evaluator and bench.py so the bench
    measures exactly the path the product runs.
    """
    needed = max(int(s[C.SAMPLE_NUM_OBJS]) for s in samples)
    for bucket in slot_buckets:
        if bucket >= needed:
            return bucket
    return num_boxes


class BatchedPullPipeline:
    """Dispatch-side accumulator + background pull/process worker.

    Args:
        process_fn: called as process_fn(sample, host_outputs) for every
            added item, in order, from the worker thread.
        pull_batch: samples per packed device->host transfer.
        on_pull_time: optional callback(per_sample_seconds, n) invoked
            once per pulled batch (for timing stats).
    """

    def __init__(self, process_fn, pull_batch=8, on_pull_time=None):
        self._process_fn = process_fn
        self._pull_batch = max(int(pull_batch), 1)
        self._on_pull_time = on_pull_time
        self._queue = queue_lib.Queue(maxsize=2)
        self._errors = []
        self._pending = []
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def _run(self):
        import time
        while True:
            batch = self._queue.get()
            if batch is None:
                return
            try:
                t0 = time.time()
                pulled = transfer.device_get_packed(
                    [step_out for _, step_out in batch])
                per_sample = (time.time() - t0) / len(batch)
                if self._on_pull_time is not None:
                    self._on_pull_time(per_sample, len(batch))
                for (sample, _), host_out in zip(batch, pulled):
                    self._process_fn(sample, host_out)
            except BaseException as exc:  # surfaced by close()
                self._errors.append(exc)
                return

    def _safe_put(self, item):
        """Bounded put that can't deadlock if the worker died."""
        while not self._errors:
            try:
                self._queue.put(item, timeout=1.0)
                return True
            except queue_lib.Full:
                continue
        return False

    def add(self, sample, step_out):
        """Queues one dispatched (host sample, device outputs) pair."""
        self._pending.append((sample, step_out))
        if len(self._pending) >= self._pull_batch:
            self._safe_put(self._pending)
            self._pending = []

    def close(self):
        """Flushes, joins the worker, and re-raises any worker error."""
        if self._pending:
            self._safe_put(self._pending)
            self._pending = []
        self._safe_put(None)
        self._worker.join()
        if self._errors:
            raise self._errors[0]
