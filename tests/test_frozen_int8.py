"""--model.frozen_int8: packed int8 fast forward for the frozen m3ae/mae tower.

Pins the policy-level routing (models/policy/models.py::encode fast branches),
the calibration builder (build_frozen_qpack), and the numerics: int8 encodes
stay close to the frozen_bf16 recipe across ARPDT / GCBC-goal / text /
intermediate / mae paths, gradients still flow through the trained policy,
and the feature refuses to run without a calibrated pack.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arp_tpu.models import m3ae as m3ae_lib
from arp_tpu.models.policy import ARPDT, BC, GCBC, build_frozen_qpack
from arp_tpu.models.policy.models import BERT_VOCAB_SIZE
from arp_tpu.ops import m3ae_infer

from test_policies import IMG, PATCH, WINDOW, base_config, make_batch

TINY = dict(model_type=None, emb_dim=32, dec_emb_dim=16, depth=2, dec_depth=1,
            num_heads=4, dec_num_heads=4, mlp_ratio=2)
NPATCH = (IMG // PATCH) ** 2


def _cos(a, b):
    a = np.asarray(a, np.float32).reshape(-1)
    b = np.asarray(b, np.float32).reshape(-1)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))


def _fake_m3ae_vars():
    model = m3ae_lib.MaskedMultimodalAutoencoder(
        config_updates=dict(TINY), text_vocab_size=BERT_VOCAB_SIZE
    )
    probe = jnp.zeros((1, NPATCH, PATCH * PATCH * 3), jnp.float32)
    ids = jnp.zeros((1, 16), jnp.int32)
    pad = jnp.zeros((1, 16), jnp.float32)
    return jax.jit(
        lambda r: model.init({"params": r}, probe, ids, pad,
                             method=model.forward_representation, deterministic=True)
    )(jax.random.PRNGKey(11))


@pytest.fixture
def frozen_m3ae_loader(monkeypatch):
    vars_ = _fake_m3ae_vars()
    monkeypatch.setattr(
        m3ae_lib, "load_m3ae_model_vars", lambda name, checkpoint_dir=None: vars_
    )
    return vars_


def _batch_patches(batch, with_goal=False):
    """Patchify exactly as BasePolicy.encode does (views stacked, then flat)."""
    image = jnp.asarray(list(batch["image"].values()))
    image = jnp.reshape(image, (-1,) + image.shape[-3:])
    patch = m3ae_lib.extract_patches(image, PATCH)
    if not with_goal:
        return patch, None
    goal = jnp.asarray(list(batch["goal"].values()))
    goal = jnp.reshape(goal, (-1,) + goal.shape[-3:])
    return patch, m3ae_lib.extract_patches(goal, PATCH)


def _qpack_for(batch, vars_, with_goal=False, text=False):
    patch, goal = _batch_patches(batch, with_goal)
    kw = {}
    if text:
        n = patch.shape[0] // batch["instruct"].shape[0]
        kw = dict(
            text_ids=jnp.tile(batch["instruct"], (n, 1)),
            text_padding_mask=jnp.tile(batch["text_padding_mask"], (n, 1)),
        )
    return m3ae_infer.build_m3ae_qpack(
        vars_, TINY["depth"], TINY["num_heads"], patch, goal_patch=goal, **kw
    )


def _policy_outputs(cfg_over, batch, model_cls=ARPDT, qpack=None):
    model = model_cls(config_updates=cfg_over, num_actions=15, patch_dim=PATCH,
                      frozen_qpack=qpack)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    params = model.init(rngs, batch, deterministic=True)["params"]
    out = model.apply({"params": params}, batch, deterministic=True)
    return model, params, out


def _base(**over):
    cfg = base_config(transfer_type="m3ae_vit_b16", use_from_scratch=False)
    cfg["m3ae"] = dict(TINY)
    cfg.update(over)
    return cfg


def test_policy_frozen_int8_parity_and_grads(frozen_m3ae_loader):
    batch = make_batch(np.random.default_rng(8))
    _, params_ref, out_ref = _policy_outputs(_base(frozen_bf16=True), batch)

    qpack = _qpack_for(batch, frozen_m3ae_loader)
    model, params, out = _policy_outputs(_base(frozen_int8=True), batch, qpack=qpack)

    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_ref)
    assert _cos(out_ref["action_pred"], out["action_pred"]) > 0.95
    assert np.isfinite(float(out["loss"]))

    def loss_fn(p):
        return model.apply({"params": p}, batch, deterministic=True)["loss"]

    grads = jax.grad(loss_fn)(params)
    assert all(np.isfinite(np.asarray(g, np.float32)).all()
               for g in jax.tree_util.tree_leaves(grads))
    # the policy's own input projection must receive nonzero gradients
    assert float(np.abs(np.asarray(grads["image_text_input"]["kernel"])).max()) > 0


def test_policy_frozen_int8_attn_parity(frozen_m3ae_loader):
    """frozen_int8_attn (w8a8 attention on top of the int8 pack) stays close
    to frozen_bf16 at the policy level; 'true' implies frozen_int8 and the
    'auto' default resolves to true under frozen_int8 (round-4 measured
    default: flagship step 118 -> 86 ms)."""
    from arp_tpu.models.policy.models import get_policy_default_config

    cfg = get_policy_default_config(dict(frozen_int8_attn="true",
                                         transfer_type="m3ae_vit_b16"))
    assert cfg.frozen_int8 and cfg.frozen_bf16
    auto = get_policy_default_config(dict(frozen_int8=True,
                                          transfer_type="m3ae_vit_b16"))
    assert auto.frozen_int8_attn == "true"
    off = get_policy_default_config(dict(transfer_type="m3ae_vit_b16"))
    assert off.frozen_int8_attn == "false" and not off.frozen_int8

    batch = make_batch(np.random.default_rng(12))
    _, _, out_ref = _policy_outputs(_base(frozen_bf16=True), batch)
    qpack = _qpack_for(batch, frozen_m3ae_loader)
    _, _, out = _policy_outputs(_base(frozen_int8_attn="true"), batch, qpack=qpack)
    assert _cos(out_ref["action_pred"], out["action_pred"]) > 0.95
    assert np.isfinite(float(out["loss"]))


def test_policy_frozen_int8_gcbc_goal(frozen_m3ae_loader):
    batch = make_batch(np.random.default_rng(9), with_goal=True)
    _, _, out_ref = _policy_outputs(_base(frozen_bf16=True), batch, model_cls=GCBC)
    qpack = _qpack_for(batch, frozen_m3ae_loader, with_goal=True)
    _, _, out = _policy_outputs(_base(frozen_int8=True), batch, model_cls=GCBC, qpack=qpack)
    assert _cos(out_ref["action_pred"], out["action_pred"]) > 0.95


def test_policy_frozen_int8_text(frozen_m3ae_loader):
    batch = make_batch(np.random.default_rng(10), with_text=True)
    cfg_ref = _base(frozen_bf16=True, use_text=True)
    _, _, out_ref = _policy_outputs(cfg_ref, batch)
    qpack = _qpack_for(batch, frozen_m3ae_loader, text=True)
    _, _, out = _policy_outputs(_base(frozen_int8=True, use_text=True), batch, qpack=qpack)
    assert _cos(out_ref["action_pred"], out["action_pred"]) > 0.95


def test_policy_frozen_int8_intermediate(frozen_m3ae_loader):
    batch = make_batch(np.random.default_rng(11))
    _, p_ref, out_ref = _policy_outputs(_base(frozen_bf16=True, use_intermediate=True), batch)
    qpack = _qpack_for(batch, frozen_m3ae_loader)
    _, p, out = _policy_outputs(_base(frozen_int8=True, use_intermediate=True), batch, qpack=qpack)
    # use_intermediate widens image_text_input by depth x — same tree both ways
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(p_ref)
    assert _cos(out_ref["action_pred"], out["action_pred"]) > 0.95


def test_policy_frozen_int8_mae_path(monkeypatch):
    mae_tiny = dict(TINY)
    model = m3ae_lib.MaskedAutoencoder(config_updates=dict(mae_tiny, use_type_embedding=False))
    probe = jnp.zeros((1, NPATCH, PATCH * PATCH * 3), jnp.float32)
    vars_ = jax.jit(
        lambda r: model.init({"params": r}, probe,
                             method=model.forward_representation, deterministic=True)
    )(jax.random.PRNGKey(12))
    monkeypatch.setattr(m3ae_lib, "load_m3ae_model_vars",
                        lambda name, checkpoint_dir=None: vars_)
    batch = make_batch(np.random.default_rng(13))
    cfg = base_config(transfer_type="mae_vit_b16", use_from_scratch=False)
    cfg["mae"] = dict(mae_tiny, use_type_embedding=False)
    _, _, out_ref = _policy_outputs(dict(cfg, frozen_bf16=True), batch, model_cls=BC)
    patch, _ = _batch_patches(batch)
    qpack = m3ae_infer.build_m3ae_qpack(vars_, TINY["depth"], TINY["num_heads"], patch)
    _, _, out = _policy_outputs(dict(cfg, frozen_int8=True), batch, model_cls=BC, qpack=qpack)
    assert _cos(out_ref["action_pred"], out["action_pred"]) > 0.95


def test_frozen_int8_requires_qpack(frozen_m3ae_loader):
    batch = make_batch(np.random.default_rng(14))
    with pytest.raises(AssertionError, match="frozen_qpack"):
        _policy_outputs(_base(frozen_int8=True), batch, qpack=None)


def test_build_frozen_qpack_end_to_end(frozen_m3ae_loader):
    """The trainer-facing builder: raw uint8-like frames -> calibrated pack
    consistent with a policy that encodes eval-transformed frames."""
    from arp_tpu.ops.augment import make_eval_transform

    rng = np.random.default_rng(15)
    frames = rng.integers(0, 255, size=(2, WINDOW, IMG, IMG, 3)).astype(np.uint8)
    raw_batch = {
        "image": {"ob": jnp.asarray(frames)},
        "rtg": {"ob": jnp.asarray(rng.normal(size=(2, WINDOW, 1)).astype(np.float32))},
        "action": jnp.asarray(rng.integers(0, 15, size=(2, WINDOW)).astype(np.int32)),
        "goal": None, "instruct": None, "text_padding_mask": None,
    }
    cfg = _base(frozen_int8=True)
    qpack = build_frozen_qpack(cfg, raw_batch, PATCH, image_size=IMG)

    transform = make_eval_transform(image_size=IMG)
    flat = jnp.asarray(frames).reshape((-1, IMG, IMG, 3))
    transformed = transform(flat).reshape((2, WINDOW, IMG, IMG, 3))
    model_batch = dict(raw_batch, image={"ob": transformed})

    _, _, out_ref = _policy_outputs(_base(frozen_bf16=True), model_batch)
    _, _, out = _policy_outputs(cfg, model_batch, qpack=qpack)
    assert _cos(out_ref["action_pred"], out["action_pred"]) > 0.95


def test_amax_save_load_rebuilds_identical_qpack(frozen_m3ae_loader, tmp_path):
    """Persisted calibration scales (ADVICE r4 #3): rebuilding the pack from
    saved amaxes is bit-identical to the original calibration-time pack, even
    when no calibration batch statistics are available at restore time."""
    from arp_tpu.train.common import load_frozen_amax, save_frozen_amax

    rng = np.random.default_rng(16)
    frames = rng.integers(0, 255, size=(2, WINDOW, IMG, IMG, 3)).astype(np.uint8)
    raw_batch = {
        "image": {"ob": jnp.asarray(frames)},
        "rtg": {"ob": jnp.asarray(rng.normal(size=(2, WINDOW, 1)).astype(np.float32))},
        "action": jnp.asarray(rng.integers(0, 15, size=(2, WINDOW)).astype(np.int32)),
        "goal": None, "instruct": None, "text_padding_mask": None,
    }
    cfg = _base(frozen_int8=True)
    qpack, amax = build_frozen_qpack(cfg, raw_batch, PATCH, image_size=IMG, return_amax=True)

    save_frozen_amax(str(tmp_path), amax)
    loaded = load_frozen_amax(str(tmp_path))
    assert loaded is not None and set(loaded["layers"]) == set(amax["layers"])

    # a DIFFERENT (would-be recalibration) batch must not matter: the pack is
    # rebuilt purely from the stored scales
    other_batch = dict(raw_batch, image={"ob": jnp.asarray(
        rng.integers(0, 255, size=(2, WINDOW, IMG, IMG, 3)).astype(np.uint8))})
    qpack2 = build_frozen_qpack(cfg, other_batch, PATCH, image_size=IMG, amax=loaded)

    flat1 = jax.tree_util.tree_leaves_with_path(qpack)
    flat2 = jax.tree_util.tree_leaves_with_path(qpack2)
    assert len(flat1) == len(flat2)
    for (p1, a), (p2, b) in zip(flat1, flat2):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(p1))

    assert load_frozen_amax(str(tmp_path / "absent")) is None


def test_frozen_int8_implies_frozen_bf16():
    from arp_tpu.models.policy import get_policy_default_config

    cfg = get_policy_default_config(dict(frozen_int8=True, transfer_type="m3ae_vit_b16"))
    assert cfg.frozen_bf16
    assert cfg.m3ae.compute_dtype == "bfloat16"
