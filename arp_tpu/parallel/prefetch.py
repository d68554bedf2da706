"""Host -> HBM prefetching.

Double-buffered device prefetch so the host pipeline (HDF5 reads, batching)
overlaps with TPU compute.  Equivalent role to
``flax.jax_utils.prefetch_to_device`` in the reference trainer
(main_procgen.py:703-708), but targeting mesh-sharded global arrays instead of
pmap-stacked per-device arrays, and with a background thread so host-side
batch assembly itself is off the critical path.
"""

from __future__ import annotations

import collections
import queue
import threading
from typing import Iterator

from .mesh import shard_batch


def prefetch_to_device(iterator: Iterator, size: int, mesh) -> Iterator:
    """Shard each batch onto the mesh, keeping `size` batches in flight."""
    buf = collections.deque()

    def enqueue(n):
        for batch in _take(iterator, n):
            buf.append(shard_batch(batch, mesh))

    enqueue(size)
    while buf:
        yield buf.popleft()
        enqueue(1)


def _take(iterator, n):
    for _ in range(n):
        try:
            yield next(iterator)
        except StopIteration:
            return


class ThreadedPrefetch:
    """Run an iterator in a daemon thread with a bounded queue.

    Keeps host batch assembly (augmentation staging, HDF5 decompression)
    overlapped with device steps.  Use together with
    :func:`prefetch_to_device` for a 2-stage pipeline.
    """

    _SENTINEL = object()

    def __init__(self, iterator: Iterator, capacity: int = 4):
        self._queue: queue.Queue = queue.Queue(maxsize=capacity)
        self._err = None

        def worker():
            try:
                for item in iterator:
                    self._queue.put(item)
            except BaseException as e:  # propagate to consumer
                self._err = e
            finally:
                self._queue.put(self._SENTINEL)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
