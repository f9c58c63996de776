"""Background-thread batch prefetcher (host/device overlap).

The reference overlaps data loading with compute via 20 DataLoader worker
processes (train.py:101-102). Here a lighter-weight double-buffering
thread builds the next batch (host decode + splat + sample assembly) while
the device executes the current step; jax dispatch is async so one thread
suffices to hide host latency. The heavy per-sample work is the native C++
splat kernel (data/native.py) when built.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator


class Prefetcher:
    """Wrap a batch-producing iterator; keeps `depth` batches in flight."""

    def __init__(self, make_batches: Iterator, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._done = object()
        self._err = None

        def worker():
            try:
                for b in make_batches:
                    self._q.put(b)
            except BaseException as e:  # surfaced on next __next__
                self._err = e
            finally:
                self._q.put(self._done)

        self._t = threading.Thread(target=worker, daemon=True)
        self._t.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetched_epoch(dataset, index_batches, key, crop_size: int,
                     num_points: int, depth: int = 2):
    """Prefetched batch stream for one epoch (drop-in for the trainer's
    make_batch loop)."""
    import jax
    from pose_estimation_tpu.data.batching import make_batch

    def gen():
        for bi, idx in enumerate(index_batches):
            yield make_batch(dataset, idx, jax.random.fold_in(key, bi),
                             crop_size, num_points)

    return Prefetcher(gen(), depth=depth)
