"""Small shared utilities: pos-embeds, symlog, scale heuristics, timers.

TPU note: sincos position embeddings are computed with jnp inside jit so XLA
constant-folds them at compile time (static shapes) — no host round-trips.
Reference semantics: arp_dt/utils.py:297-338 (pos embeds), 445-463
(symlog/compute_scale).
"""

from __future__ import annotations

import time

import jax.numpy as jnp
import numpy as np


def get_1d_sincos_pos_embed_from_grid(embed_dim: int, pos):
    assert embed_dim % 2 == 0
    omega = jnp.arange(embed_dim // 2, dtype=jnp.float32)
    omega = omega / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    pos = pos.reshape(-1)
    out = jnp.einsum("m,d->md", pos, omega)
    return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=1)


def get_1d_sincos_pos_embed(embed_dim: int, length: int):
    return jnp.expand_dims(
        get_1d_sincos_pos_embed_from_grid(embed_dim, jnp.arange(length, dtype=jnp.float32)), 0
    )


def get_2d_sincos_pos_embed(embed_dim: int, length: int):
    grid_size = int(length**0.5)
    assert grid_size * grid_size == length, "2d pos embed needs a square token grid"
    assert embed_dim % 2 == 0
    grid_h = jnp.arange(grid_size, dtype=jnp.float32)
    grid_w = jnp.arange(grid_size, dtype=jnp.float32)
    grid = jnp.meshgrid(grid_w, grid_h)  # w goes first
    grid = jnp.stack(grid, axis=0).reshape([2, 1, grid_size, grid_size])
    emb_h = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[0])
    emb_w = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[1])
    return jnp.expand_dims(jnp.concatenate([emb_h, emb_w], axis=1), 0)


def symlog(x):
    return jnp.sign(x) * jnp.log(1 + jnp.abs(x))


def symexp(x):
    return jnp.sign(x) * (jnp.exp(jnp.abs(x)) - 1)


def compute_scale(return_to_go) -> float:
    """Order-of-magnitude scale for return normalization.

    Same digit heuristic as the reference (arp_dt/utils.py:453-463): a power of
    ten sized so the normalized return-to-go lands in roughly [0.5, 5].
    """
    s = str(abs(int(return_to_go)))  # int(-0.5) is "0": sign-free digits
    max_digit = int(s[0])
    n = len(s) - 1 if max_digit < 5 else len(s)
    return pow(10, n)


def image_float2int(image):
    return np.clip(image * 255.0, 0.0, 255.0).astype(np.uint8)


class Timer:
    def __init__(self):
        self._time = None

    def __enter__(self):
        self._start_time = time.time()
        return self

    def __exit__(self, exc_type, exc_value, exc_tb):
        self._time = time.time() - self._start_time

    def __call__(self):
        return self._time
