"""Fast ViT encode path (ops/vit_infer.py): oracle parity + quantized modes."""

import jax
import jax.numpy as jnp
import numpy as np

from arp_tpu.models.clip import CLIP
from arp_tpu.ops.vit_infer import (
    calibrate_vit,
    pack_vit_params,
    quantize_packed,
    vit_encode,
    vit_encode_int8,
)
from tests.test_reward_engine import TINY_CFG

N_LAYERS = TINY_CFG["vision_num_layers"]
HEADS = TINY_CFG["vision_features"] // 64
PATCH = TINY_CFG["vision_patch_size"]
IMG = 32
N_PATCHES = (IMG // PATCH) ** 2


def _setup():
    model = CLIP(**TINY_CFG)
    rng = np.random.default_rng(0)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, IMG, IMG, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32),
    )
    patches = rng.normal(size=(4, N_PATCHES, PATCH * PATCH * 3)).astype(np.float32)
    return model, variables, jnp.asarray(patches)


def test_fp32_pack_is_oracle_exact():
    model, variables, patches = _setup()
    want = model.apply(variables, patches, normalize=False, method=model.encode_image)
    packed = pack_vit_params(variables, N_LAYERS, dtype=jnp.float32)
    got = vit_encode(packed, patches, HEADS, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def _cos(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(
        np.mean(
            np.sum(a * b, -1)
            / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-12)
        )
    )


def test_bf16_pack_close_to_fp32():
    model, variables, patches = _setup()
    want = np.asarray(model.apply(variables, patches, normalize=False, method=model.encode_image))
    packed = pack_vit_params(variables, N_LAYERS)  # bf16
    got = vit_encode(packed, patches, HEADS)
    assert _cos(got, want) > 0.995, _cos(got, want)


def test_bf16_scores_close_to_fp32_scores():
    """score_dtype=bfloat16 (halved softmax HBM traffic) stays feature-close."""
    model, variables, patches = _setup()
    want = np.asarray(model.apply(variables, patches, normalize=False, method=model.encode_image))
    packed = pack_vit_params(variables, N_LAYERS)
    got = vit_encode(packed, patches, HEADS, score_dtype=jnp.bfloat16)
    assert _cos(got, want) > 0.995, _cos(got, want)
    # and against the fp32-score bf16 path (isolates the softmax dtype)
    ref = vit_encode(packed, patches, HEADS)
    assert _cos(got, ref) > 0.999, _cos(got, ref)


def test_int8_static_calibrated_close():
    model, variables, patches = _setup()
    want = np.asarray(model.apply(variables, patches, normalize=False, method=model.encode_image))
    packed = pack_vit_params(variables, N_LAYERS)
    amax = jax.tree_util.tree_map(np.asarray, calibrate_vit(packed, patches, HEADS))
    qpacked = quantize_packed(packed, amax)
    got = vit_encode_int8(qpacked, patches, HEADS)
    c = _cos(got, want)
    assert c > 0.98, c
    # calibration transfers: fresh inputs from the same distribution stay close
    rng = np.random.default_rng(1)
    fresh = jnp.asarray(rng.normal(size=patches.shape).astype(np.float32))
    want2 = np.asarray(model.apply(variables, fresh, normalize=False, method=model.encode_image))
    got2 = vit_encode_int8(qpacked, fresh, HEADS)
    c2 = _cos(got2, want2)
    assert c2 > 0.97, c2


def test_int8_attention_calibrated_close():
    """w8a8 attention (int8 QK^T / P@V, static scales) stays feature-close
    to the oracle and to the bf16-attention int8 path it extends."""
    model, variables, patches = _setup()
    want = np.asarray(model.apply(variables, patches, normalize=False, method=model.encode_image))
    packed = pack_vit_params(variables, N_LAYERS)
    amax = jax.tree_util.tree_map(np.asarray, calibrate_vit(packed, patches, HEADS))
    qpacked = quantize_packed(packed, amax)
    got = vit_encode_int8(qpacked, patches, HEADS, score_dtype=jnp.bfloat16, int8_attn=True)
    c = _cos(got, want)
    assert c > 0.97, c
    ref = vit_encode_int8(qpacked, patches, HEADS, score_dtype=jnp.bfloat16)
    c_ref = _cos(got, ref)
    assert c_ref > 0.98, c_ref
    # calibration transfers to fresh inputs
    rng = np.random.default_rng(2)
    fresh = jnp.asarray(rng.normal(size=np.asarray(patches).shape).astype(np.float32))
    want2 = np.asarray(model.apply(variables, fresh, normalize=False, method=model.encode_image))
    c2 = _cos(vit_encode_int8(qpacked, fresh, HEADS, score_dtype=jnp.bfloat16, int8_attn=True), want2)
    assert c2 > 0.96, c2


def test_int8_attention_needs_round4_pack():
    """Packs calibrated without the attn_in site refuse int8_attn loudly."""
    import pytest

    model, variables, patches = _setup()
    packed = pack_vit_params(variables, N_LAYERS)
    amax = jax.tree_util.tree_map(np.asarray, calibrate_vit(packed, patches, HEADS))
    amax["layers"] = {k: v for k, v in amax["layers"].items() if k != "attn_in"}
    qpacked = quantize_packed(packed, amax)
    with pytest.raises(ValueError, match="attn_in"):
        vit_encode_int8(qpacked, patches, HEADS, int8_attn=True)


def test_engine_fast_paths_match_standard():
    """ClipRewardEngine(fast_encode=True) rewards match the standard path
    closely (bf16) and int8 stays within quantization tolerance."""
    from arp_tpu.reward.engine import ClipRewardEngine
    from tests.test_reward_engine import IMG_SIZE, TinyTokenizer

    model, variables, _ = _setup()
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(10, 48, 48, 3), dtype=np.uint8)
    tok = TinyTokenizer()

    base = ClipRewardEngine(model=model, variables=variables, batch_size=4,
                            resize_mode="pil", image_size=IMG_SIZE, tokenizer=tok,
                            compute_dtype=jnp.bfloat16)
    fast = ClipRewardEngine(model=model, variables=variables, batch_size=4,
                            resize_mode="pil", image_size=IMG_SIZE, tokenizer=tok,
                            fast_encode=True)
    q = ClipRewardEngine(model=model, variables=variables, batch_size=4,
                         resize_mode="pil", image_size=IMG_SIZE, tokenizer=tok,
                         fast_int8=True)
    sm16 = ClipRewardEngine(model=model, variables=variables, batch_size=4,
                            resize_mode="pil", image_size=IMG_SIZE, tokenizer=tok,
                            fast_int8=True, fast_score_bf16=True)
    r0 = base.text_rewards(frames, "a coin")
    r1 = fast.text_rewards(frames, "a coin")
    r2 = q.text_rewards(frames, "a coin")
    r3 = sm16.text_rewards(frames, "a coin")
    assert base._fast is None  # oracle must run the standard path
    assert fast._fast is not None and q._fast is not None
    assert q._fast_q is not None  # lazy calibration ran
    np.testing.assert_allclose(r1, r0, rtol=0.05, atol=0.05)
    np.testing.assert_allclose(r2, r0, rtol=0.12, atol=0.12)
    # bf16 scores ride on the int8 tolerance (softmax dtype adds ~1e-3)
    np.testing.assert_allclose(r3, r0, rtol=0.12, atol=0.12)
    np.testing.assert_allclose(r3, r2, rtol=0.05, atol=0.05)
    # goal rewards too (unnormalized feature path)
    g0 = base.goal_rewards(frames, goal_index=-1)
    g1 = fast.goal_rewards(frames, goal_index=-1)
    np.testing.assert_allclose(g1, g0, rtol=0.08, atol=0.3)
    # w8a8 attention rides on the int8 engine path (fast_int8_attn knob)
    a8 = ClipRewardEngine(model=model, variables=variables, batch_size=4,
                          resize_mode="pil", image_size=IMG_SIZE, tokenizer=tok,
                          fast_int8=True, fast_int8_attn=True)
    r4 = a8.text_rewards(frames, "a coin")
    np.testing.assert_allclose(r4, r0, rtol=0.12, atol=0.12)
    np.testing.assert_allclose(r4, r2, rtol=0.06, atol=0.06)


def test_fused_int8_matmul_kernel():
    """Pallas fused kernel (interpret mode) == the plain XLA int8 matmul."""
    from arp_tpu.ops.vit_infer import _qmatmul, _quant_w, fused_int8_matmul

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(37, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32))
    wq, ws = _quant_w(w)
    a = jnp.float32(float(np.abs(np.asarray(x)).max()))
    bias = jnp.asarray(rng.normal(size=(1, 48)).astype(np.float32))

    ref = np.asarray(_qmatmul(x, a, wq, ws, bias))
    got = np.asarray(fused_int8_matmul(x, a, wq, ws, bias, interpret=True, block_m=16), np.float32)
    np.testing.assert_allclose(got, ref, rtol=0.02, atol=0.02)

    refg = ref * (1.0 / (1.0 + np.exp(-1.702 * ref)))
    gotg = np.asarray(
        fused_int8_matmul(x, a, wq, ws, bias, act="quickgelu", interpret=True, block_m=16),
        np.float32,
    )
    np.testing.assert_allclose(gotg, refg, rtol=0.05, atol=0.05)


def test_int8_pallas_impl_matches_xla():
    """Full int8 forward: pallas impl (interpret) tracks the XLA impl."""
    model, variables, patches = _setup()
    packed = pack_vit_params(variables, N_LAYERS)
    amax = jax.tree_util.tree_map(np.asarray, calibrate_vit(packed, patches, HEADS))
    qpacked = quantize_packed(packed, amax)
    a = vit_encode_int8(qpacked, patches, HEADS, impl="xla")
    b = vit_encode_int8(qpacked, patches, HEADS, impl="pallas", interpret=True, unroll=True)
    assert _cos(a, b) > 0.999, _cos(a, b)
