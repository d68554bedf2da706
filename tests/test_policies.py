"""Policy model tests: ARPDT / BC / GCBC forward, losses, training, greedy APIs."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax.training.train_state import TrainState

from arp_tpu.models.policy import ARPDT, BC, GCBC, EnsembleHeads

WINDOW = 2
IMG = 32
PATCH = 16


def make_batch(rng, batch_size=2, with_rtg=True, with_goal=True, with_text=False):
    batch = {
        "image": {"ob": jnp.asarray(rng.normal(size=(batch_size, WINDOW, IMG, IMG, 3)).astype(np.float32))},
        "action": jnp.asarray(rng.integers(0, 15, size=(batch_size, WINDOW)).astype(np.int32)),
    }
    if with_rtg:
        batch["rtg"] = {"ob": jnp.asarray(rng.normal(size=(batch_size, WINDOW, 1)).astype(np.float32))}
    if with_goal:
        batch["goal"] = {"ob": jnp.asarray(rng.normal(size=(batch_size, WINDOW, IMG, IMG, 3)).astype(np.float32))}
    if with_text:
        batch["instruct"] = jnp.asarray(rng.integers(1, 100, size=(batch_size, 16)).astype(np.int32))
        batch["text_padding_mask"] = jnp.zeros((batch_size, 16), jnp.float32)
    else:
        batch["instruct"] = None
        batch["text_padding_mask"] = None
    return batch


def base_config(**over):
    cfg = dict(
        model_type="vit_debug",  # DT mask + explicit small dims
        transfer_type="none",
        emb_dim=32,
        depth=2,
        num_heads=4,
        mlp_ratio=2,
        use_discrete_action=True,
        num_ensembles=3,
    )
    cfg.update(over)
    return cfg


def _init_and_forward(model, batch):
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    params = model.init(rngs, batch, deterministic=True)["params"]
    out = model.apply({"params": params}, batch, deterministic=True)
    return params, out


def test_arpdt_forward_and_losses():
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    model = ARPDT(config_updates=base_config(), num_actions=15, patch_dim=PATCH)
    params, out = _init_and_forward(model, batch)
    assert out["action_pred"].shape == (2, WINDOW, 15)
    assert out["return_pred"].shape == (2, WINDOW, 1)
    for key in ("loss", "acc", "trans_loss", "return_loss"):
        assert np.isfinite(float(np.asarray(out[key]).reshape(-1)[0])), key
    # loss = trans + lambda * return
    np.testing.assert_allclose(
        float(out["loss"]), float(out["trans_loss"]) + 1.0 * float(out["return_loss"]), rtol=1e-5
    )


def test_bc_and_gcbc_forward():
    rng = np.random.default_rng(1)
    batch = make_batch(rng)
    for cls in (BC, GCBC):
        model = cls(config_updates=base_config(), num_actions=15, patch_dim=PATCH)
        params, out = _init_and_forward(model, batch)
        assert out["action_pred"].shape == (2, WINDOW, 15)
        assert "return_pred" not in out


def test_greedy_action_discrete():
    rng = np.random.default_rng(2)
    batch = make_batch(rng)
    model = ARPDT(config_updates=base_config(), num_actions=15, patch_dim=PATCH)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    params = model.init(rngs, batch, deterministic=True)["params"]
    action = model.apply({"params": params}, batch, method=model.greedy_action)
    assert action.shape == (2,)
    assert action.dtype in (jnp.int32, jnp.int64)
    ret = model.apply({"params": params}, batch, method=model.greedy_return)
    assert ret.shape == (2, WINDOW, 1)


def test_sample_action_temperature():
    """sample_action: greedy limit at T->0, reproducible per key, and actually
    stochastic at high temperature (the round-4 ordering eval needs
    non-degenerate decode — see BasePolicy.sample_action)."""
    rng = np.random.default_rng(7)
    batch = make_batch(rng, batch_size=8)
    model = ARPDT(config_updates=base_config(), num_actions=15, patch_dim=PATCH)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    params = model.init(rngs, batch, deterministic=True)["params"]
    greedy = model.apply({"params": params}, batch, method=model.greedy_action)

    key = jax.random.PRNGKey(42)
    cold = model.apply({"params": params}, batch, key, 1e-4, method=model.sample_action)
    np.testing.assert_array_equal(np.asarray(cold), np.asarray(greedy))

    hot1 = model.apply({"params": params}, batch, key, 50.0, method=model.sample_action)
    hot1b = model.apply({"params": params}, batch, key, 50.0, method=model.sample_action)
    np.testing.assert_array_equal(np.asarray(hot1), np.asarray(hot1b))  # seeded
    hots = [
        np.asarray(model.apply({"params": params}, batch, jax.random.PRNGKey(k), 50.0,
                               method=model.sample_action))
        for k in range(5)
    ]
    assert any(not np.array_equal(hots[0], h) for h in hots[1:]), "high-T samples never varied"


def test_arpdt_trains():
    """A few adamw steps must reduce the action CE loss on a fixed batch."""
    rng = np.random.default_rng(3)
    batch = make_batch(rng)
    model = ARPDT(config_updates=base_config(), num_actions=15, patch_dim=PATCH)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    params = model.init(rngs, batch, deterministic=True)["params"]
    state = TrainState.create(apply_fn=model.apply, params=params, tx=optax.adamw(3e-4))

    @jax.jit
    def step(state, batch):
        def loss_fn(p):
            out = model.apply({"params": p}, batch, deterministic=True)
            return out["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    losses = []
    for _ in range(8):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_clip_from_scratch_path(monkeypatch):
    """transfer_type=clip_* with use_from_scratch trains CLIP jointly (no ckpt)."""
    from arp_tpu.models.clip import CLIP
    from arp_tpu.models.clip import model as clip_model_mod

    tiny = dict(embed_dim=16, vocab_size=97, vision_num_layers=1, vision_features=64,
                vision_patch_size=16, text_features=16, text_num_heads=4, text_num_layers=1)
    monkeypatch.setitem(clip_model_mod.MODELS, "tiny_test", lambda **kw: CLIP(**{**tiny, **kw}))

    rng = np.random.default_rng(4)
    batch = make_batch(rng, with_text=True)
    cfg = base_config(transfer_type="clip_tiny_test", use_from_scratch=True, use_text=True)
    batch["image"] = {"ob": jnp.asarray(rng.normal(size=(2, WINDOW, 64, 64, 3)).astype(np.float32))}
    model = ARPDT(config_updates=cfg, num_actions=15, patch_dim=PATCH)
    small = jax.tree_util.tree_map(lambda x: x[:1] if hasattr(x, "shape") else x, batch)
    params, out = _init_and_forward(model, small)
    assert out["action_pred"].shape == (1, WINDOW, 15)


def test_impala_backbone_path():
    rng = np.random.default_rng(5)
    batch = make_batch(rng)
    cfg = base_config(transfer_type="clip_vit_b32", use_impala_backbone=True, use_from_scratch=True)
    model = ARPDT(config_updates=cfg, num_actions=15, patch_dim=PATCH)
    params, out = _init_and_forward(model, batch)
    assert out["action_pred"].shape == (2, WINDOW, 15)


def test_m3ae_from_scratch_path_and_gcbc_goal():
    rng = np.random.default_rng(6)
    batch = make_batch(rng)
    m3ae_cfg = {"model_type": None, "emb_dim": 32, "dec_emb_dim": 16, "depth": 2, "dec_depth": 1,
                "num_heads": 4, "dec_num_heads": 4, "mlp_ratio": 2}
    cfg = base_config(transfer_type="m3ae_vit_b16", use_from_scratch=True)
    cfg["m3ae"] = m3ae_cfg
    model = GCBC(config_updates=cfg, num_actions=15, patch_dim=PATCH)
    params, out = _init_and_forward(model, batch)
    assert out["action_pred"].shape == (2, WINDOW, 15)


def test_adapter_gate(monkeypatch):
    from arp_tpu.models.clip import CLIP
    from arp_tpu.models.clip import model as clip_model_mod

    tiny = dict(embed_dim=16, vocab_size=97, vision_num_layers=1, vision_features=64,
                vision_patch_size=16, text_features=16, text_num_heads=4, text_num_layers=1)
    monkeypatch.setitem(clip_model_mod.MODELS, "tiny_test", lambda **kw: CLIP(**{**tiny, **kw}))

    rng = np.random.default_rng(7)
    batch = make_batch(rng)
    cfg = base_config(transfer_type="clip_tiny_test", use_from_scratch=True, use_adapter=True)
    model = ARPDT(config_updates=cfg, num_actions=15, patch_dim=PATCH)
    small = jax.tree_util.tree_map(lambda x: x[:1] if hasattr(x, "shape") else x, batch)
    small["image"] = {"ob": jnp.asarray(rng.normal(size=(1, WINDOW, 64, 64, 3)).astype(np.float32))}
    params, out = _init_and_forward(model, small)
    assert "residual_weight" in params


def test_ensemble_heads_distinct_params():
    heads = EnsembleHeads(num_ensembles=3, hidden_dim=8, out_dim=4)
    x = jnp.ones((2, 8))
    params = heads.init(jax.random.PRNGKey(0), x)["params"]
    kernels = params["heads"]["Dense_0"]["kernel"]
    assert kernels.shape[0] == 3
    # members must be independently initialized
    assert not np.allclose(np.asarray(kernels[0]), np.asarray(kernels[1]))
    out = heads.apply({"params": params}, x)
    assert out.shape == (2, 4)


def test_size_presets():
    from arp_tpu.models.policy.models import get_policy_default_config

    cfg = get_policy_default_config({"model_type": "base"})
    assert (cfg.emb_dim, cfg.depth, cfg.num_heads) == (768, 6, 12)
    cfg = get_policy_default_config({"model_type": "smalll"})
    assert cfg.emb_dim == 2560
    # "vit_base" keeps explicit dims (matches how the reference actually runs)
    cfg = get_policy_default_config({"model_type": "vit_base", "emb_dim": 128})
    assert cfg.emb_dim == 128


def test_remat_parity():
    """remat=True must not change forward outputs, gradients, or the param tree
    — only the backward-pass activation footprint (jax.checkpoint)."""
    rng = np.random.default_rng(11)
    batch = make_batch(rng)
    base = ARPDT(config_updates=base_config(), num_actions=15, patch_dim=PATCH)
    rmt = ARPDT(config_updates=base_config(remat=True), num_actions=15, patch_dim=PATCH)
    params, out = _init_and_forward(base, batch)
    params_r, out_r = _init_and_forward(rmt, batch)
    jax.tree_util.tree_map(np.testing.assert_array_equal, params, params_r)
    np.testing.assert_array_equal(np.asarray(out["action_pred"]), np.asarray(out_r["action_pred"]))

    def loss(model):
        def f(p):
            return model.apply({"params": p}, batch, deterministic=True)["loss"]
        return f

    g = jax.grad(loss(base))(params)
    g_r = jax.grad(loss(rmt))(params_r)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5), g, g_r
    )


def test_bf16_compute_dtype():
    """compute_dtype=bfloat16: params stay fp32, outputs stay fp32 (residual
    stream + final LN), values track the fp32 forward within bf16 tolerance."""
    rng = np.random.default_rng(13)
    batch = make_batch(rng)
    f32 = ARPDT(config_updates=base_config(), num_actions=15, patch_dim=PATCH)
    bf16 = ARPDT(config_updates=base_config(compute_dtype="bfloat16"), num_actions=15, patch_dim=PATCH)
    params, out = _init_and_forward(f32, batch)
    params_b, out_b = _init_and_forward(bf16, batch)
    # identical init trees, all fp32
    jax.tree_util.tree_map(np.testing.assert_array_equal, params, params_b)
    assert all(p.dtype == jnp.float32 for p in jax.tree_util.tree_leaves(params_b))
    assert out_b["action_pred"].dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(out["action_pred"]), np.asarray(out_b["action_pred"]), atol=0.05, rtol=0.1
    )
    # trains: one adamw step under jit produces finite loss and fp32 params
    state = TrainState.create(apply_fn=bf16.apply, params=params_b, tx=optax.adamw(1e-3))

    @jax.jit
    def step(state):
        def loss_fn(p):
            return bf16.apply({"params": p}, batch, deterministic=True)["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    state, loss = step(state)
    assert np.isfinite(float(loss))
    assert all(p.dtype == jnp.float32 for p in jax.tree_util.tree_leaves(state.params))


def test_frozen_clip_bf16_cast(monkeypatch):
    """compute_dtype=bfloat16 on the frozen-CLIP transfer path: the tower runs
    in bf16 via variable/input casting, outputs come back fp32 and track the
    fp32 forward."""
    from arp_tpu.models.clip import CLIP
    from arp_tpu.models.clip import model as clip_model_mod

    tiny = dict(embed_dim=16, vocab_size=97, vision_num_layers=1, vision_features=64,
                vision_patch_size=16, text_features=16, text_num_heads=4, text_num_layers=1)
    monkeypatch.setitem(clip_model_mod.MODELS, "tiny_test", lambda **kw: CLIP(**{**tiny, **kw}))
    rng = np.random.default_rng(9)
    clip = CLIP(**tiny)
    clip_vars = clip.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, 77), jnp.int32),
    )
    monkeypatch.setattr(clip_model_mod, "load_model_vars", lambda name, **kw: clip_vars)

    batch = make_batch(rng)
    batch["image"] = {"ob": jnp.asarray(rng.normal(size=(2, WINDOW, 64, 64, 3)).astype(np.float32))}
    f32 = ARPDT(config_updates=base_config(transfer_type="clip_tiny_test"),
                num_actions=15, patch_dim=PATCH)
    bf16 = ARPDT(config_updates=base_config(transfer_type="clip_tiny_test", compute_dtype="bfloat16"),
                 num_actions=15, patch_dim=PATCH)
    params, out = _init_and_forward(f32, batch)
    out_b = bf16.apply({"params": params}, batch, deterministic=True)
    assert out_b["action_pred"].dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(out["action_pred"]), np.asarray(out_b["action_pred"]), atol=0.05, rtol=0.1
    )


def test_memory_knob_propagation():
    """--model.remat / --model.compute_dtype reach the m3ae/mae encoder
    sub-configs (which dominate compute under the flagship policy); explicit
    non-default sub values win."""
    cfg = ARPDT.get_default_config(dict(remat=True, compute_dtype="bfloat16"))
    assert cfg.m3ae.remat and cfg.mae.remat
    assert cfg.m3ae.compute_dtype == "bfloat16" and cfg.mae.compute_dtype == "bfloat16"
    # defaults stay untouched
    base = ARPDT.get_default_config({})
    assert not base.m3ae.remat and base.m3ae.compute_dtype == "float32"


def test_gcbc_goal_blind_transfer_warns():
    """GCBC with a transfer type whose encoder branch ignores the goal frame
    (reference parity: GCBC.py's none/clip branches) must warn loudly that it
    trains as plain BC; the goal-consuming m3ae path must not warn."""
    import warnings

    rng = np.random.default_rng(11)
    batch = make_batch(rng)

    model = GCBC(config_updates=base_config(), num_actions=15, patch_dim=PATCH)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        _init_and_forward(model, batch)
    assert any("trains as plain BC" in str(w.message) for w in caught)

    m3ae_cfg = {"model_type": None, "emb_dim": 32, "dec_emb_dim": 16, "depth": 2,
                "dec_depth": 1, "num_heads": 4, "dec_num_heads": 4, "mlp_ratio": 2}
    cfg = base_config(transfer_type="m3ae_vit_b16", use_from_scratch=True)
    cfg["m3ae"] = m3ae_cfg
    model = GCBC(config_updates=cfg, num_actions=15, patch_dim=PATCH)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        _init_and_forward(model, batch)
    assert not any("trains as plain BC" in str(w.message) for w in caught)
