"""Parity tests for the packed frozen-m3ae fast forward (ops/m3ae_infer.py).

Oracle: the flax m3ae module itself (models/m3ae.py), which is in turn
oracle-identical to the reference m3ae under converted params
(tests/test_m3ae.py) — so fp32 agreement here transitively pins the packed
path to the reference numerics (arp_dt/models/m3ae/model.py:471-525).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arp_tpu.models import m3ae as m3ae_lib
from arp_tpu.ops import m3ae_infer

DEPTH, HEADS, EMB = 2, 4, 64
PATCH, IMG = 8, 32
NPATCH = (IMG // PATCH) ** 2
VOCAB = 97


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def _make(text: bool = True, use_type: bool = True):
    cfg = dict(
        model_type=None, emb_dim=EMB, depth=DEPTH, num_heads=HEADS,
        dec_emb_dim=32, dec_depth=1, dec_num_heads=2, mlp_ratio=2,
        use_type_embedding=use_type,
    )
    if text:
        model = m3ae_lib.MaskedMultimodalAutoencoder(config_updates=cfg, text_vocab_size=VOCAB)
    else:
        model = m3ae_lib.MaskedAutoencoder(config_updates=cfg)
    rng = jax.random.PRNGKey(0)
    patch = jax.random.normal(jax.random.PRNGKey(1), (3, NPATCH, PATCH * PATCH * 3))
    if text:
        # init WITH text so the text_embedding params exist in the tree
        init_ids = jnp.zeros((3, 7), jnp.int32)
        init_pad = jnp.zeros((3, 7), jnp.float32)
        params = model.init(
            {"params": rng}, patch, init_ids, init_pad,
            method=model.forward_representation, deterministic=True,
        )
    else:
        params = model.init(
            {"params": rng}, patch, method=model.forward_representation, deterministic=True
        )
    return model, params, patch


def test_packed_fp32_matches_flax_image_only():
    model, params, patch = _make()
    ref = model.apply(params, patch, None, None,
                      method=model.forward_representation, deterministic=True)
    packed = m3ae_infer.pack_m3ae_params(params, DEPTH, dtype=jnp.float32)
    out = m3ae_infer.m3ae_encode(packed, patch, HEADS, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_packed_fp32_matches_flax_mae():
    model, params, patch = _make(text=False, use_type=False)
    ref = model.apply(params, patch, method=model.forward_representation, deterministic=True)
    packed = m3ae_infer.pack_m3ae_params(params, DEPTH, dtype=jnp.float32)
    out = m3ae_infer.m3ae_encode(packed, patch, HEADS, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_packed_fp32_matches_flax_text():
    model, params, patch = _make()
    ids = jax.random.randint(jax.random.PRNGKey(2), (3, 7), 0, VOCAB)
    pad = jnp.zeros((3, 7), jnp.float32).at[:, 5:].set(1.0)  # last 2 padded
    ref = model.apply(params, patch, ids, pad,
                      method=model.forward_representation, deterministic=True)
    packed = m3ae_infer.pack_m3ae_params(params, DEPTH, dtype=jnp.float32)
    out = m3ae_infer.m3ae_encode(packed, patch, HEADS, text_ids=ids,
                                 text_padding_mask=pad, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_packed_fp32_matches_flax_goal_joint():
    model, params, patch = _make()
    goal = jax.random.normal(jax.random.PRNGKey(3), patch.shape)
    ref = model.apply(params, patch, goal,
                      method=model.forward_gc_representations, deterministic=True)
    packed = m3ae_infer.pack_m3ae_params(params, DEPTH, dtype=jnp.float32)
    out = m3ae_infer.m3ae_encode(packed, patch, HEADS, goal_patch=goal,
                                 compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_packed_intermediates_match_flax():
    model, params, patch = _make()
    ref, states = model.apply(
        params, patch, None, None, method=model.forward_representation,
        deterministic=True, capture_intermediates=True, mutable=["intermediates"],
    )
    packed = m3ae_infer.pack_m3ae_params(params, DEPTH, dtype=jnp.float32)
    out, inter = m3ae_infer.m3ae_encode(
        packed, patch, HEADS, compute_dtype=jnp.float32, return_intermediates=True
    )
    assert inter.shape[0] == DEPTH
    for i in range(DEPTH):
        ref_i = states["intermediates"]["encoder"][f"intermediate_layer_{i}"][0]
        np.testing.assert_allclose(np.asarray(inter[i]), np.asarray(ref_i), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_packed_bf16_close():
    model, params, patch = _make()
    ref = model.apply(params, patch, None, None,
                      method=model.forward_representation, deterministic=True)
    packed = m3ae_infer.pack_m3ae_params(params, DEPTH)
    out = m3ae_infer.m3ae_encode(packed, patch, HEADS)
    assert out.dtype == jnp.float32
    assert _cos(out, ref) > 0.995


def test_unroll_matches_scan():
    model, params, patch = _make()
    packed = m3ae_infer.pack_m3ae_params(params, DEPTH, dtype=jnp.float32)
    a = m3ae_infer.m3ae_encode(packed, patch, HEADS, compute_dtype=jnp.float32)
    b = m3ae_infer.m3ae_encode(packed, patch, HEADS, compute_dtype=jnp.float32, unroll=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("variant", ["image", "text", "goal"])
def test_int8_cosine(variant):
    model, params, patch = _make()
    kw = {}
    if variant == "text":
        ids = jax.random.randint(jax.random.PRNGKey(2), (3, 7), 0, VOCAB)
        pad = jnp.zeros((3, 7), jnp.float32).at[:, 5:].set(1.0)
        kw = dict(text_ids=ids, text_padding_mask=pad)
        ref = model.apply(params, patch, ids, pad,
                          method=model.forward_representation, deterministic=True)
    elif variant == "goal":
        goal = jax.random.normal(jax.random.PRNGKey(3), patch.shape)
        kw = dict(goal_patch=goal)
        ref = model.apply(params, patch, goal,
                          method=model.forward_gc_representations, deterministic=True)
    else:
        ref = model.apply(params, patch, None, None,
                          method=model.forward_representation, deterministic=True)
    qpack = m3ae_infer.build_m3ae_qpack(params, DEPTH, HEADS, patch, **kw)
    out = m3ae_infer.m3ae_encode_int8(qpack, patch, HEADS, **kw)
    assert out.dtype == jnp.float32
    assert _cos(out, ref) > 0.98, _cos(out, ref)


@pytest.mark.parametrize("variant", ["image", "text", "goal"])
def test_int8_attn_cosine(variant):
    """w8a8 attention (int8_attn=True) stays close on every token stream,
    incl. the padded-text path (kv mask applied on int32-derived scores)."""
    model, params, patch = _make()
    kw = {}
    if variant == "text":
        ids = jax.random.randint(jax.random.PRNGKey(2), (3, 7), 0, VOCAB)
        pad = jnp.zeros((3, 7), jnp.float32).at[:, 5:].set(1.0)
        kw = dict(text_ids=ids, text_padding_mask=pad)
        ref = model.apply(params, patch, ids, pad,
                          method=model.forward_representation, deterministic=True)
    elif variant == "goal":
        goal = jax.random.normal(jax.random.PRNGKey(3), patch.shape)
        kw = dict(goal_patch=goal)
        ref = model.apply(params, patch, goal,
                          method=model.forward_gc_representations, deterministic=True)
    else:
        ref = model.apply(params, patch, None, None,
                          method=model.forward_representation, deterministic=True)
    qpack = m3ae_infer.build_m3ae_qpack(params, DEPTH, HEADS, patch, **kw)
    out = m3ae_infer.m3ae_encode_int8(qpack, patch, HEADS, int8_attn=True,
                                      score_dtype=jnp.bfloat16, **kw)
    assert out.dtype == jnp.float32
    assert _cos(out, ref) > 0.97, _cos(out, ref)
    base = m3ae_infer.m3ae_encode_int8(qpack, patch, HEADS,
                                       score_dtype=jnp.bfloat16, **kw)
    assert _cos(out, base) > 0.98, _cos(out, base)


def test_int8_attn_needs_round4_pack():
    model, params, patch = _make()
    packed = m3ae_infer.pack_m3ae_params(params, DEPTH)
    amax = jax.device_get(m3ae_infer.calibrate_m3ae(packed, patch, HEADS))
    amax["layers"] = {k: v for k, v in amax["layers"].items() if k != "attn_in"}
    qpack = m3ae_infer.quantize_m3ae_packed(packed, amax)
    with pytest.raises(ValueError, match="attn_in"):
        m3ae_infer.m3ae_encode_int8(qpack, patch, HEADS, int8_attn=True)


def test_int8_intermediates_shape():
    model, params, patch = _make()
    qpack = m3ae_infer.build_m3ae_qpack(params, DEPTH, HEADS, patch)
    out, inter = m3ae_infer.m3ae_encode_int8(qpack, patch, HEADS, return_intermediates=True)
    assert inter.shape == (DEPTH, 3, NPATCH + 1, EMB)


def test_int8_jits_and_is_stable_across_batches():
    """The static scales must hold for unseen (same-distribution) batches."""
    model, params, patch = _make()
    qpack = m3ae_infer.build_m3ae_qpack(params, DEPTH, HEADS, patch)
    f = jax.jit(lambda p: m3ae_infer.m3ae_encode_int8(qpack, p, HEADS))
    other = jax.random.normal(jax.random.PRNGKey(9), patch.shape)
    ref = model.apply(params, other, None, None,
                      method=model.forward_representation, deterministic=True)
    assert _cos(f(other), ref) > 0.97
