"""RNG management.

A small stateful PRNG-key dispenser for host-side code (reference:
``JaxRNG`` / ``next_rng`` in arp_dt/utils.py:27-74), plus pure helpers for
folding keys inside jitted code.  Inside jit we never use the global stream —
keys are threaded explicitly or derived with ``jax.random.fold_in`` so the
trace stays pure and reproducible.
"""

from __future__ import annotations

import random as _pyrandom

import jax
import numpy as np


class RngStream:
    """Stateful convenience wrapper around a JAX PRNG key (host-side only)."""

    @classmethod
    def from_seed(cls, seed: int) -> "RngStream":
        return cls(jax.random.PRNGKey(seed))

    def __init__(self, rng):
        self.rng = rng

    def __call__(self, keys=None):
        if keys is None:
            self.rng, split = jax.random.split(self.rng)
            return split
        if isinstance(keys, int):
            splits = jax.random.split(self.rng, num=keys + 1)
            self.rng = splits[0]
            return tuple(splits[1:])
        splits = jax.random.split(self.rng, num=len(keys) + 1)
        self.rng = splits[0]
        return {key: val for key, val in zip(keys, splits[1:])}


_global_stream: RngStream | None = None


def init_rng(seed: int) -> None:
    global _global_stream
    _global_stream = RngStream.from_seed(seed)


def next_rng(*args, **kwargs):
    global _global_stream
    if _global_stream is None:
        init_rng(42)
    return _global_stream(*args, **kwargs)


def set_random_seed(seed: int) -> None:
    np.random.seed(seed)
    _pyrandom.seed(seed)
    init_rng(seed)
