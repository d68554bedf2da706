"""Attention & mask correctness: pallas kernel (interpret) vs XLA vs naive numpy.

The DT mask semantics are validated against an independently-built dense mask
mirroring the reference construction (causal OR per-timestep obs block,
arp_dt/ARPDT.py:175-200).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arp_tpu.ops.attention import _pallas_attention, _xla_attention, dot_product_attention
from arp_tpu.ops.masks import MaskSpec, materialize_mask


def reference_dt_mask(seq_len, num_obs_token, num_token_per_step):
    causal = np.tril(np.ones((seq_len, seq_len)))
    block = np.zeros((seq_len, seq_len))
    num_steps = seq_len // num_token_per_step
    for s in range(num_steps):
        lo = s * num_token_per_step
        hi = lo + num_obs_token
        block[lo:hi, lo:hi] = 1.0
    return np.logical_or(causal, block)


def naive_attention(q, k, v, mask, kv_padding=None):
    # q,k,v: (b, n, h, d); mask: (n, n) bool
    scale = q.shape[-1] ** -0.5
    s = np.einsum("bqhd,bkhd->bhqk", q, k) * scale
    allowed = np.broadcast_to(mask[None, None], s.shape).copy()
    if kv_padding is not None:
        allowed &= (kv_padding == 0)[:, None, None, :]
    s = np.where(allowed, s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", p, v)


@pytest.mark.parametrize("kind", ["none", "causal", "dt"])
def test_materialize_mask_matches_reference(kind):
    n, obs, per_step = 12, 2, 4
    spec = MaskSpec(kind, num_obs_token=obs, num_token_per_step=per_step)
    got = np.asarray(materialize_mask(spec, n))
    if kind == "none":
        expected = np.ones((n, n), bool)
    elif kind == "causal":
        expected = np.tril(np.ones((n, n))).astype(bool)
    else:
        expected = reference_dt_mask(n, obs, per_step)
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize("kind", ["none", "causal", "dt"])
def test_xla_attention_vs_naive(kind):
    rng = np.random.default_rng(0)
    b, n, h, d = 2, 12, 2, 8
    q, k, v = (rng.normal(size=(b, n, h, d)).astype(np.float32) for _ in range(3))
    spec = MaskSpec(kind, num_obs_token=2, num_token_per_step=4)
    got = dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), spec, impl="xla")
    expected = naive_attention(q, k, v, np.asarray(materialize_mask(spec, n)).astype(bool))
    np.testing.assert_allclose(np.asarray(got), expected, atol=2e-5)


def test_xla_attention_padding():
    rng = np.random.default_rng(1)
    b, n, h, d = 2, 10, 2, 8
    q, k, v = (rng.normal(size=(b, n, h, d)).astype(np.float32) for _ in range(3))
    pad = np.zeros((b, n), np.int32)
    pad[0, 7:] = 1
    pad[1, 3:] = 1
    spec = MaskSpec("none")
    got = dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), spec, kv_padding=jnp.asarray(pad), impl="xla"
    )
    expected = naive_attention(q, k, v, np.ones((n, n), bool), kv_padding=pad)
    np.testing.assert_allclose(np.asarray(got), expected, atol=2e-5)


@pytest.mark.parametrize("kind", ["none", "causal", "dt"])
@pytest.mark.parametrize("n", [128, 200, 384])
def test_pallas_attention_vs_xla(kind, n, monkeypatch):
    # Interpret mode lets the kernel run on CPU.
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp)
    import arp_tpu.ops.attention as attn_mod

    monkeypatch.setattr(attn_mod.pl, "pallas_call", interp)

    rng = np.random.default_rng(2)
    b, h, d = 1, 2, 16
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32)) for _ in range(3))
    spec = MaskSpec(kind, num_obs_token=2, num_token_per_step=4)
    scale = d**-0.5
    got = _pallas_attention(q, k, v, spec, None, scale)
    expected = _xla_attention(q, k, v, spec, None, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-4)


def test_pallas_attention_padding(monkeypatch):
    import arp_tpu.ops.attention as attn_mod

    orig = attn_mod.pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(attn_mod.pl, "pallas_call", interp)

    rng = np.random.default_rng(3)
    b, h, n, d = 2, 2, 160, 16
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32)) for _ in range(3))
    pad = np.zeros((b, n), np.int32)
    pad[0, 100:] = 1
    pad[1, 50:] = 1
    spec = MaskSpec("none")
    scale = d**-0.5
    got = attn_mod._pallas_attention(q, k, v, spec, jnp.asarray(pad), scale)
    expected = attn_mod._xla_attention(q, k, v, spec, jnp.asarray(pad), scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-4)
