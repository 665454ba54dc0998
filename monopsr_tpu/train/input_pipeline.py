"""Prefetching host input pipeline.

The reference's feed_dict assembly is a known per-step bottleneck (it
wall-clock-times it, ref: src/monopsr/core/evaluator.py:207-211). Here
sample assembly (cv2 decode, label merge, jitter, resize) runs in
background threads that stay ahead of the device step; cv2 releases the
GIL for its hot loops, so a small pool overlaps cleanly with the jitted
step dispatch.
"""

import queue
import threading

from monopsr_tpu.train import trainer as trainer_lib


class PrefetchingLoader:
    """Produces stacked sample batches ahead of consumption.

    Args:
        dataset: KittiDataset in 'train' mode.
        batch_size: samples per batch (= data-parallel width).
        image_input_shape: (h, w) host resize target.
        queue_depth: max prepared batches in flight.
        num_threads: producer threads (dataset access is locked; the
            parallelism is in decode/resize).
    """

    def __init__(self, dataset, batch_size, image_input_shape,
                 queue_depth=4, num_threads=2, shuffle=True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.image_input_shape = image_input_shape
        self.shuffle = shuffle

        self._queue = queue.Queue(maxsize=queue_depth)
        self._stop = threading.Event()
        self._dataset_lock = threading.Lock()
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(num_threads)]
        for t in self._threads:
            t.start()

    def _next_samples(self):
        """Pulls raw sample dicts under the dataset lock."""
        with self._dataset_lock:
            return self.dataset.next_batch(self.batch_size, self.shuffle)

    def _worker(self):
        while not self._stop.is_set():
            samples = []
            while len(samples) < self.batch_size:
                raw = self._next_samples()
                for s in raw:
                    if s is not None and len(samples) < self.batch_size:
                        samples.append(trainer_lib.prepare_sample(
                            s, self.image_input_shape))
            batch = trainer_lib.stack_samples(samples)
            while not self._stop.is_set():
                try:
                    self._queue.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def get_batch(self, timeout=300):
        return self._queue.get(timeout=timeout)

    def stop(self):
        self._stop.set()
        # Drain so workers blocked on put() can exit
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
