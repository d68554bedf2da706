"""--model.frozen_bf16: full-bf16 inference recipe for frozen pretrained towers.

The flagship train step is dominated by the frozen m3ae forward; measured on
a v5e the full-cast recipe (params bf16 once + bf16 layernorms/residual
stream, scripts/bench_m3ae_dtype.py) runs ~33% faster than the fp32 path,
while the reference's standard mixed-precision recipe (bf16 matmuls, fp32
LNs — compute_dtype) is actually SLOWER than fp32 on this model due to cast
ping-pong. These tests pin:
  * numerics: full-bf16 encodes stay close to fp32 (cosine) at the layer and
    policy level, and the default path is bit-identical to before the knob;
  * semantics: the recipe only touches frozen towers — policy params/dtypes,
    use_from_scratch incompatibility, CLIP + m3ae + mae + GCBC-goal paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arp_tpu.models.layers import Transformer
from arp_tpu.models import m3ae as m3ae_lib
from arp_tpu.models.policy import ARPDT, GCBC
from arp_tpu.models.policy.models import BERT_VOCAB_SIZE, get_policy_default_config

from test_policies import PATCH, base_config, make_batch


def _cos(a, b):
    a = np.asarray(a, np.float32).reshape(-1)
    b = np.asarray(b, np.float32).reshape(-1)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))


def test_transformer_ln_dtype_full_bf16_close_to_fp32():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 32), jnp.float32)
    tf_fp32 = Transformer(emb_dim=32, depth=2, num_heads=4, mlp_ratio=2, mlp_bias=True)
    params = tf_fp32.init(jax.random.PRNGKey(1), x, True)["params"]
    ref = tf_fp32.apply({"params": params}, x, True)
    assert ref.dtype == jnp.float32

    tf_bf16 = Transformer(
        emb_dim=32, depth=2, num_heads=4, mlp_ratio=2, mlp_bias=True,
        compute_dtype=jnp.bfloat16, ln_dtype=jnp.bfloat16,
    )
    p16 = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
    out = tf_bf16.apply({"params": p16}, x, True)
    # the whole stack (residual stream included) runs narrow
    assert out.dtype == jnp.bfloat16
    assert _cos(ref, out) > 0.99


def test_transformer_score_dtype_bf16_close_to_fp32():
    """score_dtype=bf16 (bf16 attention scores + softmax) stays close to the
    fp32-softmax recipe — the chip-dependent HBM-traffic knob on top of the
    frozen full-bf16 recipe."""
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 9, 32), jnp.float32)
    tf_fp32 = Transformer(emb_dim=32, depth=2, num_heads=4, mlp_ratio=2, mlp_bias=True)
    params = tf_fp32.init(jax.random.PRNGKey(7), x, True)["params"]
    ref = tf_fp32.apply({"params": params}, x, True)

    tf_sm16 = Transformer(
        emb_dim=32, depth=2, num_heads=4, mlp_ratio=2, mlp_bias=True,
        compute_dtype=jnp.bfloat16, ln_dtype=jnp.bfloat16, score_dtype=jnp.bfloat16,
    )
    p16 = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
    out = tf_sm16.apply({"params": p16}, x, True)
    assert out.dtype == jnp.bfloat16
    assert _cos(ref, out) > 0.99


def test_transformer_score_dtype_default_is_bit_identical():
    """score_dtype=None must leave the fp32-softmax path untouched."""
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 9, 32), jnp.float32)
    tf = Transformer(emb_dim=32, depth=2, num_heads=4, mlp_ratio=2, mlp_bias=True)
    tf_explicit = Transformer(
        emb_dim=32, depth=2, num_heads=4, mlp_ratio=2, mlp_bias=True,
        score_dtype=jnp.float32,
    )
    params = tf.init(jax.random.PRNGKey(9), x, True)["params"]
    a = tf.apply({"params": params}, x, True)
    b = tf_explicit.apply({"params": params}, x, True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_m3ae_score_dtype_threads_through_config():
    cfg = dict(model_type=None, emb_dim=32, dec_emb_dim=16, depth=2, dec_depth=1,
               num_heads=4, dec_num_heads=4, mlp_ratio=2)
    patch = jax.random.normal(jax.random.PRNGKey(12), (2, 4, PATCH * PATCH * 3), jnp.float32)
    model32 = m3ae_lib.MaskedMultimodalAutoencoder(
        config_updates=dict(cfg), text_vocab_size=BERT_VOCAB_SIZE
    )
    params = model32.init(
        {"params": jax.random.PRNGKey(13)}, patch, None, None,
        method=model32.forward_representation, deterministic=True,
    )
    ref = model32.apply(params, patch, None, None,
                        method=model32.forward_representation, deterministic=True)
    model16 = m3ae_lib.MaskedMultimodalAutoencoder(
        config_updates=dict(cfg, compute_dtype="bfloat16", ln_dtype="bfloat16",
                            score_dtype="bfloat16"),
        text_vocab_size=BERT_VOCAB_SIZE,
    )
    p16 = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
    out = model16.apply(p16, patch, None, None,
                        method=model16.forward_representation, deterministic=True)
    assert _cos(ref, out) > 0.99


def test_transformer_ln_dtype_default_is_bit_identical():
    """ln_dtype=None must leave the training path untouched (fp32 LNs)."""
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 9, 32), jnp.float32)
    tf = Transformer(emb_dim=32, depth=2, num_heads=4, mlp_ratio=2, mlp_bias=True)
    tf_explicit = Transformer(
        emb_dim=32, depth=2, num_heads=4, mlp_ratio=2, mlp_bias=True, ln_dtype=None
    )
    params = tf.init(jax.random.PRNGKey(3), x, True)["params"]
    a = tf.apply({"params": params}, x, True)
    b = tf_explicit.apply({"params": params}, x, True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_m3ae_ln_dtype_forward_representation_close():
    cfg = dict(model_type=None, emb_dim=32, dec_emb_dim=16, depth=2, dec_depth=1,
               num_heads=4, dec_num_heads=4, mlp_ratio=2)
    model32 = m3ae_lib.MaskedMultimodalAutoencoder(
        config_updates=dict(cfg), text_vocab_size=BERT_VOCAB_SIZE
    )
    patch = jax.random.normal(jax.random.PRNGKey(4), (2, 4, PATCH * PATCH * 3), jnp.float32)
    params = model32.init(
        {"params": jax.random.PRNGKey(5)}, patch, None, None,
        method=model32.forward_representation, deterministic=True,
    )
    ref = model32.apply(params, patch, None, None,
                        method=model32.forward_representation, deterministic=True)

    model16 = m3ae_lib.MaskedMultimodalAutoencoder(
        config_updates=dict(cfg, compute_dtype="bfloat16", ln_dtype="bfloat16"),
        text_vocab_size=BERT_VOCAB_SIZE,
    )
    p16 = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
    out = model16.apply(p16, patch, None, None,
                        method=model16.forward_representation, deterministic=True)
    assert _cos(ref, out) > 0.99


def _fake_m3ae_vars(model, patch_dim):
    probe = jnp.zeros((1, 4, patch_dim * patch_dim * 3), jnp.float32)
    return jax.jit(
        lambda r: model.init({"params": r}, probe, None, None,
                             method=model.forward_representation, deterministic=True)
    )(jax.random.PRNGKey(11))


@pytest.fixture
def frozen_m3ae_loader(monkeypatch):
    """load_m3ae_model_vars -> random-init tiny vars (frozen-path tests)."""
    tiny = dict(model_type=None, emb_dim=32, dec_emb_dim=16, depth=2, dec_depth=1,
                num_heads=4, dec_num_heads=4, mlp_ratio=2)

    def fake_loader(model_name, checkpoint_dir=None):
        model = m3ae_lib.MaskedMultimodalAutoencoder(
            config_updates=dict(tiny), text_vocab_size=BERT_VOCAB_SIZE
        )
        return _fake_m3ae_vars(model, PATCH)

    monkeypatch.setattr(m3ae_lib, "load_m3ae_model_vars", fake_loader)
    return tiny


def _policy_outputs(cfg_over, batch, model_cls=ARPDT):
    model = model_cls(config_updates=cfg_over, num_actions=15, patch_dim=PATCH)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    params = model.init(rngs, batch, deterministic=True)["params"]
    out = model.apply({"params": params}, batch, deterministic=True)
    return model, params, out


def test_policy_frozen_bf16_m3ae_parity_and_grads(frozen_m3ae_loader):
    rng = np.random.default_rng(8)
    batch = make_batch(rng)
    m3ae_cfg = frozen_m3ae_loader

    base = base_config(transfer_type="m3ae_vit_b16", use_from_scratch=False)
    base["m3ae"] = dict(m3ae_cfg)
    _, params_ref, out_ref = _policy_outputs(dict(base), batch)

    fast = dict(base, frozen_bf16=True)
    fast["m3ae"] = dict(m3ae_cfg)
    model, params, out = _policy_outputs(fast, batch)

    # same trained-parameter tree, same prediction up to bf16 rounding of the
    # frozen embeddings
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_ref)
    assert _cos(out_ref["action_pred"], out["action_pred"]) > 0.98
    assert np.isfinite(float(out["loss"]))

    # gradients flow through the policy (not the frozen tower) and stay finite
    def loss_fn(p):
        return model.apply({"params": p}, batch, deterministic=True)["loss"]

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g, np.float32)).all() for g in leaves)
    # trained policy params remain fp32 (only the frozen tower is cast)
    assert all(l.dtype == jnp.float32 for l in jax.tree_util.tree_leaves(params)
               if jnp.issubdtype(l.dtype, jnp.floating))


def test_policy_frozen_bf16_gcbc_goal_path(frozen_m3ae_loader):
    rng = np.random.default_rng(9)
    batch = make_batch(rng, with_goal=True)
    m3ae_cfg = frozen_m3ae_loader
    base = base_config(transfer_type="m3ae_vit_b16", use_from_scratch=False)
    base["m3ae"] = dict(m3ae_cfg)
    _, _, out_ref = _policy_outputs(dict(base), batch, model_cls=GCBC)
    fast = dict(base, frozen_bf16=True)
    fast["m3ae"] = dict(m3ae_cfg)
    _, _, out = _policy_outputs(fast, batch, model_cls=GCBC)
    assert _cos(out_ref["action_pred"], out["action_pred"]) > 0.98


def test_policy_frozen_bf16_clip_path(monkeypatch):
    from arp_tpu.models.clip import CLIP
    from arp_tpu.models.clip import model as clip_model_mod

    tiny = dict(embed_dim=16, vocab_size=97, vision_num_layers=1, vision_features=64,
                vision_patch_size=16, text_features=16, text_num_heads=4, text_num_layers=1)
    monkeypatch.setitem(clip_model_mod.MODELS, "tiny_test", lambda **kw: CLIP(**{**tiny, **kw}))

    def fake_load(model_name, checkpoint_path=None):
        model = CLIP(**tiny)
        return jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32),
            jnp.zeros((1, 77), jnp.int32),
        )

    monkeypatch.setattr(clip_model_mod, "load_model_vars", fake_load)
    monkeypatch.setattr("arp_tpu.models.policy.models.clip_lib.load_model_vars", fake_load)

    rng = np.random.default_rng(10)
    batch = make_batch(rng)
    batch["image"] = {"ob": jnp.asarray(rng.normal(size=(2, 2, 32, 32, 3)).astype(np.float32))}
    base = base_config(transfer_type="clip_tiny_test", use_from_scratch=False)
    _, _, out_ref = _policy_outputs(dict(base), batch)
    _, _, out = _policy_outputs(dict(base, frozen_bf16=True), batch)
    assert _cos(out_ref["action_pred"], out["action_pred"]) > 0.98


def test_frozen_bf16_rejects_use_from_scratch():
    with pytest.raises(AssertionError, match="frozen_bf16"):
        get_policy_default_config(dict(frozen_bf16=True, use_from_scratch=True))


def test_frozen_bf16_sets_encoder_subconfig():
    cfg = get_policy_default_config(dict(frozen_bf16=True))
    assert cfg.m3ae.compute_dtype == "bfloat16"
    assert cfg.m3ae.ln_dtype == "bfloat16"
    assert cfg.mae.ln_dtype == "bfloat16"
    # bf16 scores are the measured default on the frozen towers (+41% step
    # throughput on a v5e); frozen_score_dtype is the escape hatch
    assert cfg.m3ae.score_dtype == "bfloat16"
    assert cfg.mae.score_dtype == "bfloat16"
    # the trained policy blocks stay at the user's setting (fp32 default)
    assert cfg.compute_dtype == "float32"


def test_frozen_score_dtype_escape_hatch():
    cfg = get_policy_default_config(dict(frozen_bf16=True, frozen_score_dtype="float32"))
    assert cfg.m3ae.score_dtype == "float32"
    assert cfg.m3ae.ln_dtype == "bfloat16"
    # without frozen_bf16 the knob is inert: the towers keep fp32 softmax
    cfg = get_policy_default_config(dict())
    assert cfg.m3ae.score_dtype == "float32"
