"""Profiling & tracing utilities.

Goes beyond the reference (which only logs HLO FLOPs at startup and wall
times via `profile_kv`, SURVEY.md §5): named wall-time accumulators, a step
timer with device sync, and one-call XLA trace capture for the TPU profiler
(tensorboard trace viewer).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax
import numpy as np


class ProfileAccumulator:
    """Accumulate wall times under names (reference: logger.profile_kv)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str, sync: bool = False):
        start = time.perf_counter()
        try:
            yield
        finally:
            if sync:
                # drain the device compute stream: enqueue a trivial op and
                # block on it — TPU executes one stream in order, so this
                # waits for all previously dispatched work.  (effects_barrier
                # only waits on effect tokens, NOT async compute.)
                jax.block_until_ready(jax.device_put(np.float32(0)) + 0)
            dt = time.perf_counter() - start
            self.totals[f"wait_{name}"] += dt
            self.counts[name] += 1

    def dump(self, reset: bool = True) -> Dict[str, float]:
        out = dict(self.totals)
        for name, c in self.counts.items():
            if c:
                out[f"mean_{name}"] = self.totals[f"wait_{name}"] / c
        if reset:
            self.totals.clear()
            self.counts.clear()
        return out


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA/TPU profiler trace viewable in tensorboard.

    with arp_tpu.profiling.trace("/tmp/trace"):
        train_step(...)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Throughput meter for the train loop (examples/sec, steps/sec)."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list = []
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    def metrics(self, batch_size: int) -> Dict[str, float]:
        if not self._times:
            return {}
        mean = sum(self._times) / len(self._times)
        return {
            "perf/step_time_s": mean,
            "perf/steps_per_sec": 1.0 / mean,
            "perf/examples_per_sec": batch_size / mean,
        }
