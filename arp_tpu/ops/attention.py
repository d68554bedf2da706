"""Fused multi-head attention for TPU.

Two implementations behind one API:

  * ``pallas`` — a FlashAttention-style kernel (online softmax, tiled over the
    query axis, K/V streamed through VMEM) with the mask evaluated *inside*
    the kernel from index arithmetic (see ops/masks.py).  No (n, n) mask or
    (b, h, n, n) score tensor ever hits HBM.
  * ``xla``    — a fused einsum path with a lazily materialized mask; XLA
    fuses it well and it runs everywhere (CPU tests).

The reference computes dense attention with host-numpy masks
(arp_dt/layers.py:45-99, models/m3ae/model.py:220-259, models/openai via
flax SelfAttention); this module is the single replacement for all of them.

``impl="auto"`` resolves to ``xla`` at every production size: measured on
the v5e chip (scripts/bench_attention.py, CLIP ViT-B/16 head shapes
B=64 H=12 D=64, bf16, 2000-iteration scan), XLA sustains 16-58 TFLOP/s
effective vs the pallas kernel's 3-11 across seq 128/197/256/512/1024 for
both none and causal masks — at head_dim 64 the XLA fusion keeps the MXU
busier than this kernel's tiling. Full table in docs/BENCHMARKS.md. The
kernel remains available via impl="pallas" (and stays exact: parity tests
run it in interpret mode).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable when running CPU-only tests
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

from .masks import MaskSpec, combine_padding, mask_allowed, materialize_mask

_BIG_NEG = -1e30


def _xla_attention(q, k, v, spec: MaskSpec, kv_padding, scale, bias=None,
                   score_dtype=jnp.float32):
    # q, k, v: (B, H, N, D).  ``score_dtype`` is the dtype of the (B, H, N, N)
    # score tensor AND the softmax — fp32 is the numerically standard recipe;
    # bf16 halves the score tensor's HBM traffic (the dominant byte term of a
    # long-sequence encoder) at the cost of bf16 softmax statistics.  bf16's
    # exponent range equals fp32's, so the _BIG_NEG mask fill stays finite.
    n = q.shape[2]
    score_dtype = jnp.dtype(score_dtype)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=score_dtype) * scale
    if bias is not None:
        s = s + bias.astype(score_dtype)
    mask = materialize_mask(spec, n)[None, None]
    if kv_padding is not None:
        mask = combine_padding(mask, kv_padding)
    s = jnp.where(mask, s, _BIG_NEG)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


def _flash_kernel(
    q_ref, k_ref, v_ref, kvmask_ref, o_ref, *, spec, scale, block_q, block_k, seq_len
):
    j_q = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)  # (block_q, D)
    head_dim = q.shape[-1]
    q_start = j_q * block_q
    q_idx = q_start + lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)

    kv_blocks = pl.cdiv(seq_len, block_k)
    if spec.kind == "causal":
        # Keys strictly after this q block contribute nothing.
        kv_blocks = jnp.minimum(kv_blocks, pl.cdiv((j_q + 1) * block_q, block_k))
    elif spec.kind == "dt":
        # DT adds intra-timestep lookahead of < num_token_per_step keys.
        kv_blocks = jnp.minimum(
            pl.cdiv(seq_len, block_k),
            pl.cdiv((j_q + 1) * block_q + spec.num_token_per_step, block_k),
        )

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # (bq, bk)
        k_idx = j * block_k + lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        allowed = mask_allowed(spec, q_idx, k_idx) & (k_idx < seq_len)
        if kvmask_ref is not None:
            pad = kvmask_ref[0, 0, pl.ds(j * block_k, block_k)].reshape(1, block_k)
            allowed = allowed & (pad == 0)
        s = jnp.where(allowed, s, _BIG_NEG)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    init = (
        jnp.full((block_q, 1), _BIG_NEG, jnp.float32),
        jnp.zeros((block_q, 1), jnp.float32),
        jnp.zeros((block_q, head_dim), jnp.float32),
    )
    _, l, acc = lax.fori_loop(0, kv_blocks, body, init)
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _pallas_attention(q, k, v, spec: MaskSpec, kv_padding, scale, block_q=128, block_k=128):
    b, h, n, d = q.shape
    # n_pad is a multiple of 128, so 128-blocks are always mosaic-legal
    # (a block_q = n for 8 < n < 128 would violate the sublane tiling rule
    # on real hardware — interpret-mode tests would not catch it)
    block_q = block_k = 128
    n_pad = -(-n // 128) * 128

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))

    qf = pad(q).reshape(b * h, n_pad, d)
    kf = pad(k).reshape(b * h, n_pad, d)
    vf = pad(v).reshape(b * h, n_pad, d)

    grid = (b * h, n_pad // block_q)
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        pl.BlockSpec((1, n_pad, d), lambda i, j: (i, 0, 0)),
        pl.BlockSpec((1, n_pad, d), lambda i, j: (i, 0, 0)),
    ]
    args = [qf, kf, vf]
    if kv_padding is not None:
        kvm = jnp.pad(kv_padding.astype(jnp.int32), ((0, 0), (0, n_pad - n)), constant_values=1)
        # 3-D so the block's last two dims equal the array's (mosaic tiling rule)
        kvm = kvm[:, None, :]
        in_specs.append(pl.BlockSpec((1, 1, n_pad), lambda i, j, _h=h: (i // _h, 0, 0)))
        args.append(kvm)
        kernel = functools.partial(
            _flash_kernel, spec=spec, scale=scale, block_q=block_q, block_k=block_k,
            seq_len=n,
        )
    else:
        def kernel(q_ref, k_ref, v_ref, o_ref):
            _flash_kernel(
                q_ref, k_ref, v_ref, None, o_ref, spec=spec, scale=scale,
                block_q=block_q, block_k=block_k, seq_len=n,
            )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d), q.dtype),
    )(*args)
    return out.reshape(b, h, n_pad, d)[:, :, :n, :]


def dot_product_attention(
    q,
    k,
    v,
    spec: MaskSpec = MaskSpec("none"),
    kv_padding: Optional[jnp.ndarray] = None,
    bias=None,
    impl: Optional[str] = None,
    score_dtype=jnp.float32,
):
    """Multi-head attention.  q/k/v: (batch, seq, heads, head_dim).

    ``kv_padding``: optional (batch, seq) array, nonzero = PAD (masked out).
    ``bias``: optional additive (1|B, H, N, N) bias (e.g. ALiBi) — xla impl only.
    ``score_dtype``: dtype of the materialized score tensor + softmax on the
    xla path (fp32 default; bf16 halves score HBM traffic).  The pallas
    kernel ignores it — its online softmax is always fp32 and its scores
    never leave VMEM.
    """
    assert q.ndim == 4, f"expected (b, n, h, d), got {q.shape}"
    scale = q.shape[-1] ** -0.5
    qt, kt, vt = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))  # (B,H,N,D)
    if impl is None or impl == "auto":
        # measured: xla wins at every production size on this hardware — see
        # module docstring / docs/BENCHMARKS.md for the numbers
        impl = "xla"
    if impl == "pallas":
        assert bias is None, "pallas path does not take dense bias; use xla"
        out = _pallas_attention(qt, kt, vt, spec, kv_padding, scale)
    else:
        out = _xla_attention(
            qt, kt, vt, spec, kv_padding, scale, bias=bias, score_dtype=score_dtype
        )
    return jnp.swapaxes(out, 1, 2)
