"""Bounded, ordered, multi-threaded prefetching for host pipelines.

The evaluator's sample assembly (KITTI IO, MSCNN merge, resize, encode)
is pure host work that can overlap device compute and transfer. A single
producer thread (round 2) leaves assembly serialized with itself; this
pool runs N workers while preserving input order and bounding in-flight
items (a full KITTI epoch must not buffer thousands of multi-MB samples).
"""

import collections
import threading
from concurrent.futures import ThreadPoolExecutor


def ordered_prefetch(fn, iterable, num_threads=2, prefetch=8):
    """Yields fn(item) for each item, in order, computed by a pool.

    Args:
        fn: callable applied to each item (runs on worker threads; must
            be thread-safe).
        iterable: input items.
        num_threads: pool size. 1 still overlaps with the consumer.
        prefetch: max completed-or-running items ahead of the consumer.

    Yields:
        fn(item) results in input order. Worker exceptions re-raise at
        the corresponding yield point.
    """
    num_threads = max(1, int(num_threads))
    prefetch = max(num_threads, int(prefetch))
    it = iter(iterable)

    with ThreadPoolExecutor(max_workers=num_threads) as pool:
        pending = collections.deque()
        try:
            for item in it:
                pending.append(pool.submit(fn, item))
                if len(pending) >= prefetch:
                    yield pending.popleft().result()
            while pending:
                yield pending.popleft().result()
        finally:
            for fut in pending:
                fut.cancel()


class StageTimes:
    """Thread-safe accumulator of per-stage wall seconds + counts."""

    def __init__(self):
        self._lock = threading.Lock()
        self._seconds = collections.defaultdict(float)
        self._counts = collections.defaultdict(int)

    def add(self, stage, seconds, n=1):
        with self._lock:
            self._seconds[stage] += seconds
            self._counts[stage] += n

    def per_item_ms(self):
        """{stage: avg milliseconds per counted item}."""
        with self._lock:
            return {stage: 1000.0 * self._seconds[stage] /
                    max(self._counts[stage], 1)
                    for stage in self._seconds}

    def total_seconds(self):
        with self._lock:
            return dict(self._seconds)
