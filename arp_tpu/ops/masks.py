"""Lazy attention-mask specifications.

The reference materializes full ``(n, n)`` float masks on the host with
numpy/scipy (causal: arp_dt/layers.py:80-94; causal-OR-block-diagonal for the
decision-transformer token stream: arp_dt/ARPDT.py:175-200) and broadcasts
them through the batch.  On TPU that wastes HBM bandwidth and blocks fusion;
here a mask is a tiny spec evaluated from index arithmetic — inside the Pallas
flash-attention kernel per tile, or as a fused ``broadcasted_iota`` compare in
the XLA path.  Nothing batch-sized is ever materialized.

DT mask semantics (ARPDT.py:191-199): token stream per timestep is
``[obs_0..obs_{K-1}, <non-obs tokens>]`` repeated; position ``i`` may attend
``j`` iff ``j <= i`` (causal) OR (same timestep AND both are obs tokens) —
i.e. obs tokens of one timestep attend each other bidirectionally.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
from jax import lax


@dataclasses.dataclass(frozen=True)
class MaskSpec:
    """Static description of the attention mask.

    kind:
      * "none"   — full attention
      * "causal" — lower triangular
      * "dt"     — causal OR intra-timestep obs-block (needs num_obs_token /
                   num_token_per_step)
    """

    kind: str = "none"
    num_obs_token: int = 0
    num_token_per_step: int = 0

    def __post_init__(self):
        assert self.kind in ("none", "causal", "dt")
        if self.kind == "dt":
            assert self.num_token_per_step > 0 and self.num_obs_token > 0


def mask_allowed(spec: MaskSpec, q_idx, k_idx):
    """Evaluate the mask at integer index arrays (broadcastable). True=attend."""
    if spec.kind == "none":
        return jnp.ones(jnp.broadcast_shapes(q_idx.shape, k_idx.shape), dtype=jnp.bool_)
    causal = k_idx <= q_idx
    if spec.kind == "causal":
        return causal
    t = spec.num_token_per_step
    same_step = (q_idx // t) == (k_idx // t)
    both_obs = ((q_idx % t) < spec.num_obs_token) & ((k_idx % t) < spec.num_obs_token)
    return causal | (same_step & both_obs)


def materialize_mask(spec: MaskSpec, seq_len: int, dtype=jnp.bool_):
    """(seq, seq) mask for the XLA attention path (fused by the compiler)."""
    q = lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 0)
    k = lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 1)
    return mask_allowed(spec, q, k).astype(dtype)


def combine_padding(mask, padding_mask: Optional[jnp.ndarray]):
    """AND a (batch, kv_len) key-padding mask (1 = PAD) into (.., q, k) mask."""
    if padding_mask is None:
        return mask
    keep = (padding_mask == 0)[:, None, None, :]
    return jnp.logical_and(mask, keep)
