"""M3AE + shared transformer parity vs the reference implementation.

The reference (pure JAX) modules are loaded standalone from /root/reference
and used as numerical oracles: random-init their params, convert with
convert_reference_m3ae_params, and require identical outputs.  This validates
both the re-implementation and the checkpoint converter that will ingest real
pickled m3ae params.
"""

import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arp_tpu.models import m3ae as my_m3ae
from arp_tpu.models.layers import Transformer
from arp_tpu.models.m3ae import convert_reference_m3ae_params
from arp_tpu.ops.masks import MaskSpec

REF = "/root/reference"


def _load_ref_module(relpath, name):
    if not os.path.exists(os.path.join(REF, relpath)):
        pytest.skip("reference repo not mounted")
    # compat shims for old jax APIs used by the reference
    if not hasattr(jax, "tree_map"):
        jax.tree_map = jax.tree.map
    spec = importlib.util.spec_from_file_location(name, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_m3ae():
    return _load_ref_module("arp_dt/models/m3ae/model.py", "ref_m3ae_model")


@pytest.fixture(scope="module")
def ref_layers():
    return _load_ref_module("arp_dt/layers.py", "ref_layers")




# Oracle tests run the reference's "debug" preset, whose emb_dim is a hefty
# 1024 (model.py:959-966) — minutes per test on the CPU mesh. Dim size does
# not change what the parity oracle validates (layouts, masks, converter
# naming, math), so both modules' preset hooks are no-op'd and tiny dims are
# injected. MaskedAutoencoder shares MaskedMultimodalAutoencoder's preset fn
# in both codebases, so one patch per module covers both classes.
TINY_DIMS = dict(
    model_type="debug", emb_dim=64, dec_emb_dim=32, depth=2, dec_depth=2,
    num_heads=4, dec_num_heads=4, mlp_ratio=2,
)


@pytest.fixture()
def tiny_cfg(ref_m3ae, monkeypatch):
    monkeypatch.setattr(ref_m3ae, "get_transformer_by_config", lambda *a, **k: None)
    monkeypatch.setattr(my_m3ae, "get_transformer_by_config", lambda *a, **k: None)
    return dict(TINY_DIMS)


def test_m3ae_forward_representation_parity(ref_m3ae, tiny_cfg):
    cfg_updates = tiny_cfg
    ref_model = ref_m3ae.MaskedMultimodalAutoencoder(config_updates=cfg_updates, text_vocab_size=50)
    my_model = my_m3ae.MaskedMultimodalAutoencoder(config_updates=cfg_updates, text_vocab_size=50)

    rng = np.random.default_rng(0)
    patch = jnp.asarray(rng.normal(size=(2, 4, 12)).astype(np.float32))
    text = jnp.asarray(rng.integers(0, 50, size=(2, 6)).astype(np.int32))
    pad = jnp.asarray(np.array([[0, 0, 0, 0, 1, 1], [0, 0, 1, 1, 1, 1]], np.float32))

    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1), "drop_path": jax.random.PRNGKey(2)}
    ref_params = ref_model.init(rngs, patch, text, pad)
    expected = ref_model.apply(
        ref_params, patch, text, pad, deterministic=True, method=ref_model.forward_representation
    )

    my_params = convert_reference_m3ae_params(ref_params)
    got = my_model.apply(my_params, patch, text, pad, deterministic=True, method=my_model.forward_representation)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-4)

    # goal-conditioned joint encoding
    goal = jnp.asarray(rng.normal(size=(2, 4, 12)).astype(np.float32))
    expected_gc = ref_model.apply(
        ref_params, patch, goal, deterministic=True, method=ref_model.forward_gc_representations
    )
    got_gc = my_model.apply(
        my_params, patch, goal, deterministic=True, method=my_model.forward_gc_representations
    )
    np.testing.assert_allclose(np.asarray(got_gc), np.asarray(expected_gc), atol=1e-4)


def test_m3ae_intermediates_capture(ref_m3ae, tiny_cfg):
    cfg_updates = tiny_cfg
    my_model = my_m3ae.MaskedMultimodalAutoencoder(config_updates=cfg_updates, text_vocab_size=50)
    rng = np.random.default_rng(1)
    patch = jnp.asarray(rng.normal(size=(2, 4, 12)).astype(np.float32))
    text = jnp.asarray(rng.integers(0, 50, size=(2, 6)).astype(np.int32))
    pad = jnp.zeros((2, 6), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    params = my_model.init(rngs, patch, text, pad)
    out, state = my_model.apply(
        params, patch, text, pad, deterministic=True,
        method=my_model.forward_representation,
        capture_intermediates=True, mutable=["intermediates"],
    )
    inter = state["intermediates"]["encoder"]
    assert "intermediate_layer_0" in inter and "intermediate_layer_1" in inter
    assert inter["intermediate_layer_0"][0].shape == out.shape


def test_mae_forward_representation(ref_m3ae, tiny_cfg):
    cfg_updates = {k: v for k, v in tiny_cfg.items()}
    ref_model = ref_m3ae.MaskedAutoencoder(config_updates=cfg_updates)
    my_model = my_m3ae.MaskedAutoencoder(config_updates=cfg_updates)
    rng = np.random.default_rng(2)
    patch = jnp.asarray(rng.normal(size=(2, 4, 12)).astype(np.float32))
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    ref_params = ref_model.init(rngs, patch)
    expected = ref_model.apply(ref_params, patch, deterministic=True, method=ref_model.forward_representation)
    my_params = convert_reference_m3ae_params(ref_params)
    got = my_model.apply(my_params, patch, deterministic=True, method=my_model.forward_representation)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-4)


def test_m3ae_autoencoding_runs(ref_m3ae, tiny_cfg):
    """Full masked-autoencoding path (encoder+decoder) executes and losses work."""
    my_model = my_m3ae.MaskedMultimodalAutoencoder(config_updates=tiny_cfg, text_vocab_size=50)
    rng = np.random.default_rng(3)
    patch = jnp.asarray(rng.normal(size=(2, 16, 12)).astype(np.float32))
    text = jnp.asarray(rng.integers(0, 50, size=(2, 8)).astype(np.int32))
    pad = jnp.zeros((2, 8), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    params = my_model.init(rngs, patch, text, pad)
    image_out, text_out, image_mask, text_mask = my_model.apply(
        params, patch, text, pad, deterministic=True, rngs={"noise": jax.random.PRNGKey(7)}
    )
    assert image_out.shape == (2, 16, 768)
    assert text_out.shape == (2, 8, 50)
    loss = my_m3ae.patch_mse_loss(image_out, jnp.zeros_like(image_out), image_mask)
    ce, acc = my_m3ae.cross_entropy_loss_and_accuracy(text_out, text, text_mask)
    assert np.isfinite(float(loss)) and np.isfinite(float(ce))


def test_patch_extract_merge_roundtrip():
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    patches = my_m3ae.extract_patches(img, 4)
    assert patches.shape == (2, 4, 48)
    back = my_m3ae.merge_patches(patches, 4)
    np.testing.assert_allclose(np.asarray(back), np.asarray(img))


def test_policy_transformer_parity(ref_layers):
    """Shared Block/Transformer vs reference arp_dt/layers.py numerics."""
    ref_model = ref_layers.Transformer(emb_dim=32, depth=2, num_heads=4, mlp_ratio=2)
    my_model = Transformer(emb_dim=32, depth=2, num_heads=4, mlp_ratio=2)

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 8, 32)).astype(np.float32))
    ref_params = ref_model.init({"params": jax.random.PRNGKey(0)}, x, deterministic=True)
    expected = ref_model.apply(ref_params, x, deterministic=True)

    my_params = convert_reference_m3ae_params(ref_params)
    got = my_model.apply(my_params, x, deterministic=True, mask_spec=MaskSpec("causal"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-4)

    # custom DT mask: reference materializes, we evaluate lazily
    import scipy.linalg

    num_obs, per_step = 2, 4
    seq = 8
    causal = np.tril(np.ones((seq, seq)))
    diag = [
        np.ones((num_obs, num_obs)) if i % 2 == 0 else np.zeros((per_step - num_obs, per_step - num_obs))
        for i in range(2 * (seq // per_step))
    ]
    custom = np.logical_or(causal, scipy.linalg.block_diag(*diag)).astype(np.float64)[None, None]
    expected_dt = ref_model.apply(ref_params, x, deterministic=True, custom_mask=custom)
    got_dt = my_model.apply(
        my_params, x, deterministic=True,
        mask_spec=MaskSpec("dt", num_obs_token=num_obs, num_token_per_step=per_step),
    )
    np.testing.assert_allclose(np.asarray(got_dt), np.asarray(expected_dt), atol=1e-4)


def test_attention_prob_dropout_training_path():
    """att_drop>0 in training uses exact probability dropout (reference parity)."""
    import jax

    from arp_tpu.models.layers import Attention

    attn = Attention(dim=32, num_heads=4, use_bias=True, att_drop=0.5)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 6, 32)).astype(np.float32))
    params = attn.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, deterministic=True, mask_spec=MaskSpec("causal"),
    )["params"]
    det = attn.apply({"params": params}, x, deterministic=True, mask_spec=MaskSpec("causal"))
    tr1 = attn.apply(
        {"params": params}, x, deterministic=False, mask_spec=MaskSpec("causal"),
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    tr2 = attn.apply(
        {"params": params}, x, deterministic=False, mask_spec=MaskSpec("causal"),
        rngs={"dropout": jax.random.PRNGKey(3)},
    )
    # stochastic in training, deterministic otherwise, all finite
    assert not np.allclose(np.asarray(tr1), np.asarray(tr2))
    assert not np.allclose(np.asarray(tr1), np.asarray(det))
    assert np.isfinite(np.asarray(tr1)).all() and np.isfinite(np.asarray(det)).all()


def test_m3ae_remat_bf16_paths():
    """remat=True matches the plain forward/gradients exactly (the policy-level
    --model.remat/--model.compute_dtype flags propagate to this config), and
    compute_dtype=bfloat16 keeps fp32 params/outputs while tracking fp32 values."""
    # model_type="debug" (a no-clobber preset is monkeypatched suite-wide by
    # tiny_cfg, but this test builds configs directly): without it the
    # default model_type="base" preset OVERWRITES these tiny dims and the
    # test silently runs a full 768-dim/12-layer model
    base_cfg = dict(model_type="debug", emb_dim=32, depth=2, num_heads=4,
                    dec_emb_dim=16, dec_depth=1, dec_num_heads=2)
    small = my_m3ae.MaskedMultimodalAutoencoder(config_updates=base_cfg, text_vocab_size=50)
    rmt = my_m3ae.MaskedMultimodalAutoencoder(
        config_updates=dict(base_cfg, remat=True), text_vocab_size=50
    )
    bf16 = my_m3ae.MaskedMultimodalAutoencoder(
        config_updates=dict(base_cfg, compute_dtype="bfloat16"), text_vocab_size=50
    )
    rng = np.random.default_rng(5)
    patch = jnp.asarray(rng.normal(size=(2, 4, 12)).astype(np.float32))
    text = jnp.asarray(rng.integers(0, 50, size=(2, 6)).astype(np.int32))
    pad = jnp.zeros((2, 6), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    params = small.init(rngs, patch, text, pad)

    def fwd(model, p):
        return model.apply(p, patch, text, pad, deterministic=True, method=model.forward_representation)

    out = fwd(small, params)
    # jax.checkpoint changes XLA fusion, so allow float-rounding-level drift
    np.testing.assert_allclose(np.asarray(out), np.asarray(fwd(rmt, params)), atol=5e-4, rtol=1e-3)

    def loss(model):
        return lambda p: jnp.sum(fwd(model, p) ** 2)

    g = jax.grad(loss(small))(params)["params"]
    g_r = jax.grad(loss(rmt))(params)["params"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3), g, g_r
    )

    out_b = fwd(bf16, params)
    assert out_b.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_b), atol=0.05, rtol=0.1)


def test_m3ae_size_presets_match_reference(ref_m3ae):
    """The small/base/large/huge/debug preset dicts must equal the
    reference's (reference m3ae/model.py:926-968) — the parity oracles run
    with the preset hook no-op'd (tiny_cfg), so drift here would ship a
    mismatched architecture for real converted checkpoints.  This test does
    NOT use tiny_cfg, so both hooks are the real ones."""
    from ml_collections import ConfigDict

    keys = ("emb_dim", "dec_emb_dim", "depth", "dec_depth", "num_heads",
            "dec_num_heads", "mlp_ratio")

    def presets(fn):
        out = {}
        for name in ("small", "base", "large", "huge", "debug"):
            cfg = ConfigDict()
            for k in keys:
                setattr(cfg, k, -1)
            fn(name, cfg)
            out[name] = {k: getattr(cfg, k) for k in keys}
        return out

    assert presets(my_m3ae.get_transformer_by_config) == presets(
        ref_m3ae.get_transformer_by_config
    )
