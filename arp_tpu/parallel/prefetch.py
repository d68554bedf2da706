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
import time
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
        self._closed = False

        def worker():
            try:
                for item in iterator:
                    if self._closed:
                        return
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
            # re-arm so calling __next__ again keeps raising StopIteration
            # instead of blocking forever on an empty queue
            self._queue.put(self._SENTINEL)
            if self._err is not None:
                err, self._err = self._err, None
                raise err
            raise StopIteration
        return item

    def close(self):
        """Stop the producer and release queued batches (safe to call early,
        e.g. on the trainer's preemption exit path)."""
        self._closed = True

        def drain():
            try:
                while True:
                    self._queue.get_nowait()
            except queue.Empty:
                pass

        # Drain/join cycles: each drain unblocks a producer stuck in
        # queue.put on a full queue (at capacity=1 it can block twice — on an
        # item and then on the finally-put of the sentinel).
        deadline = time.monotonic() + 5.0
        while True:
            drain()
            self._thread.join(timeout=0.1)
            if not self._thread.is_alive() or time.monotonic() > deadline:
                break
        # A producer that finished between the last drain and join can have
        # left [item..., sentinel] queued; drain once more so post-close
        # next() cannot return stale data ahead of the sentinel.
        drain()
        # The drains consumed the sentinel; re-arm it so post-close iteration
        # raises StopIteration instead of blocking forever.
        try:
            self._queue.put_nowait(self._SENTINEL)
        except queue.Full:
            pass
