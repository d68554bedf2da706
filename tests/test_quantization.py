"""Int8 weight quantization: roundtrip bounds, kernel parity, CLIP accuracy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arp_tpu.ops.quantization import (
    dequantize_array,
    int8_matmul,
    quantization_error,
    quantize_array,
    quantize_tree,
)


def test_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32))
    q, s = quantize_array(w)
    assert q.dtype == jnp.int8 and s.shape == (1, 128)
    back = dequantize_array(q, s)
    # per-channel symmetric int8: max error <= scale/2 per element
    max_err = np.abs(np.asarray(back - w))
    bound = np.broadcast_to(np.asarray(s) / 2 + 1e-7, max_err.shape)
    np.testing.assert_array_less(max_err, bound)
    assert quantization_error(w) < 0.01


def test_int8_matmul_matches_dequant():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(64, 96)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(96, 200)).astype(np.float32))
    q, s = quantize_array(w)
    got = int8_matmul(x, q, s)  # xla fallback on cpu
    expected = x @ dequantize_array(q, s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-4)


def test_int8_matmul_pallas_interpret(monkeypatch):
    """Force the pallas kernel (interpret mode) and compare to the reference."""
    import arp_tpu.ops.quantization as qmod

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    orig = qmod.pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(qmod.pl, "pallas_call", interp)

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(70, 128)).astype(np.float32))  # non-multiple M
    w = jnp.asarray(rng.normal(size=(128, 130)).astype(np.float32))  # non-multiple N
    q, s = quantize_array(w)
    got = qmod.int8_matmul(x, q, s)
    expected = x @ dequantize_array(q, s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-3)


def test_quantize_tree_and_clip_accuracy():
    """Quantized CLIP weights keep reward ordering (cosine of logits ~1)."""
    from arp_tpu.models.clip import CLIP
    from tests.test_reward_engine import IMG_SIZE, TINY_CFG, TinyTokenizer

    model = CLIP(**TINY_CFG)
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.normal(size=(1, IMG_SIZE, IMG_SIZE, 3)).astype(np.float32))
    text = jnp.asarray(TinyTokenizer()("x"))
    variables = model.init(jax.random.PRNGKey(0), img, text)

    qtree, dequant = quantize_tree(variables, min_size=64)
    restored = dequant(qtree)

    frames = jnp.asarray(rng.normal(size=(8, IMG_SIZE, IMG_SIZE, 3)).astype(np.float32))
    f_full = model.apply(variables, frames, normalize=True, method=model.encode_image)
    f_quant = model.apply(restored, frames, normalize=True, method=model.encode_image)
    cos = np.sum(np.asarray(f_full) * np.asarray(f_quant), axis=-1)
    assert (cos > 0.99).all(), cos

    # int8 leaves substantially shrink the byte footprint of the big kernels
    def nbytes(tree):
        return sum(np.asarray(l).nbytes for l in jax.tree_util.tree_leaves(tree))

    assert nbytes(qtree) < 0.45 * nbytes(variables)


def test_quantized_reward_engine():
    """quantize_weights=True engine: rewards track the fp32 engine closely."""
    from arp_tpu.models.clip import CLIP
    from arp_tpu.reward.engine import ClipRewardEngine
    from tests.test_reward_engine import IMG_SIZE, TINY_CFG, TinyTokenizer

    model = CLIP(**TINY_CFG)
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.normal(size=(1, IMG_SIZE, IMG_SIZE, 3)).astype(np.float32))
    text = jnp.asarray(TinyTokenizer()("x"))
    variables = model.init(jax.random.PRNGKey(0), img, text)

    kwargs = dict(model=model, batch_size=8, resize_mode="pil", image_size=IMG_SIZE,
                  tokenizer=TinyTokenizer())
    full = ClipRewardEngine(variables=variables, **kwargs)
    quant = ClipRewardEngine(variables=variables, quantize_weights=True, **kwargs)

    frames = rng.integers(0, 256, size=(6, IMG_SIZE, IMG_SIZE, 3), dtype=np.uint8)
    r_full = full.text_rewards(frames, "collect the coin.")
    r_quant = quant.text_rewards(frames, "collect the coin.")
    np.testing.assert_allclose(r_quant, r_full, atol=0.15)
    # reward ordering preserved: rank correlation, not positional argsort
    # equality (which a >0.5 threshold could pass with the top/bottom swapped)
    def ranks(x):
        r = np.empty(len(x))
        r[np.argsort(x)] = np.arange(len(x))
        return r

    ra, rb = ranks(np.asarray(r_quant)), ranks(np.asarray(r_full))
    spearman = np.corrcoef(ra, rb)[0, 1]
    assert spearman > 0.9, (spearman, r_quant, r_full)


def test_bf16_engine_reward_mae():
    """bf16 engine rewards stay within the reference's fp16-GPU noise regime."""
    from arp_tpu.models.clip import CLIP
    from arp_tpu.reward.engine import ClipRewardEngine
    from tests.test_reward_engine import IMG_SIZE, TINY_CFG, TinyTokenizer

    model = CLIP(**TINY_CFG)
    rng = np.random.default_rng(6)
    img = jnp.asarray(rng.normal(size=(1, IMG_SIZE, IMG_SIZE, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img, jnp.asarray(TinyTokenizer()("x")))
    kwargs = dict(model=model, batch_size=8, resize_mode="pil", image_size=IMG_SIZE,
                  tokenizer=TinyTokenizer(), variables=variables)
    full = ClipRewardEngine(**kwargs)
    bf16 = ClipRewardEngine(compute_dtype=jnp.bfloat16, **kwargs)
    frames = rng.integers(0, 256, size=(6, IMG_SIZE, IMG_SIZE, 3), dtype=np.uint8)
    r_full = full.text_rewards(frames, "collect the coin.")
    r_bf16 = bf16.text_rewards(frames, "collect the coin.")
    mae = np.abs(r_full - r_bf16).mean()
    assert mae < 0.05, mae
