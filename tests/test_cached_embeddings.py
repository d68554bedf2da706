"""Cached frozen-encoder embedding path: cache tool + dataset + policy."""

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from arp_tpu.data.cache_embeddings import cache_clip_embeddings
from arp_tpu.data.procgen_dataset import ProcgenDataset
from arp_tpu.models.policy import ARPDT
from tests.test_dataset import NAME, make_file
from tests.test_reward_engine import tiny_engine  # fixture


def test_cache_and_train_path(tmp_path, tiny_engine):
    make_file(tmp_path, img=48)
    h5_path = str(tmp_path / NAME / "data_train.hdf5")

    # 1. cache embeddings with the engine
    stats = cache_clip_embeddings(h5_path, tiny_engine)
    with h5py.File(h5_path, "r") as g:
        emb = g["ob_clip_emb"][:]
        assert emb.shape[0] == 24
        np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-4)
        # embedding i must equal encoding of the i-th last frame
        direct = tiny_engine._batched_image_features(g["ob"][:, -1], normalize=True)
    np.testing.assert_allclose(emb, direct, atol=1e-5)

    # 2. dataset serves embedding windows with frame-stack back-fill semantics
    cfg = {
        "path": str(tmp_path), "image_size": 48, "num_frames": 8, "window_size": 4,
        "use_vl": True, "use_cached_embeddings": True,
    }
    ds = ProcgenDataset(cfg, dataset_name=NAME, split="train")
    item = ds[0]  # trajectory start: whole window back-fills to step 0
    assert item["image_emb"]["ob"].shape == (4, emb.shape[1])
    np.testing.assert_allclose(item["image_emb"]["ob"], np.repeat(emb[:1], 4, axis=0), atol=1e-6)
    item5 = ds[5]
    np.testing.assert_allclose(item5["image_emb"]["ob"], emb[2:6], atol=1e-6)

    # 3. ARPDT trains on cached embeddings (no encoder in the model)
    model = ARPDT(
        config_updates=dict(
            model_type="vit_debug", transfer_type="clip_vit_b16_cached",
            emb_dim=32, depth=2, num_heads=4, mlp_ratio=2,
            use_discrete_action=True, num_ensembles=2,
        ),
        num_actions=15,
        patch_dim=16,
    )
    batch = {
        "image_emb": {"ob": jnp.asarray(np.stack([item["image_emb"]["ob"], item5["image_emb"]["ob"]]))},
        "rtg": {"ob": jnp.asarray(np.stack([item["rtg"]["ob"], item5["rtg"]["ob"]]))},
        "action": jnp.asarray(np.stack([item["action"], item5["action"]]).astype(np.int32)),
        "instruct": None,
        "text_padding_mask": None,
    }
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    params = model.init(rngs, batch, deterministic=True)["params"]
    out = model.apply({"params": params}, batch, deterministic=True)
    assert out["action_pred"].shape == (2, 4, 15)
    assert np.isfinite(float(out["loss"]))
    # no encoder params in the tree
    assert "pt_model" not in params and "patch_emb" not in params


def test_cached_gcbc_goal_embeddings(tmp_path, tiny_engine):
    """GCBC *_cached (VERDICT r3 #9): the dataset emits per-step hindsight-goal
    embedding windows from the SAME cache table (row j = step j's frame), the
    goal step matches the raw-frame branch's draw, and GCBC trains on
    (obs emb ++ goal emb) separate-encode conditioning with goal gradients."""
    from arp_tpu.models.policy import GCBC

    make_file(tmp_path, img=48)
    h5_path = str(tmp_path / NAME / "data_train.hdf5")
    cache_clip_embeddings(h5_path, tiny_engine)
    with h5py.File(h5_path, "r") as g:
        emb = g["ob_clip_emb"][:]

    cfg = {
        "path": str(tmp_path), "image_size": 48, "num_frames": 8, "window_size": 4,
        "use_vl": True, "use_cached_embeddings": True,
    }
    ds = ProcgenDataset(cfg, dataset_name=NAME, split="train")
    ds_live = ProcgenDataset(dict(cfg, use_cached_embeddings=False), dataset_name=NAME, split="train")
    # same per-index stream: the cached goal_emb window must be the embedding
    # rows of the step the live branch's goal frames come from
    for idx in (0, 3, 7):
        item = ds[idx]
        live = ds_live[idx]
        assert item["goal_emb"]["ob"].shape == item["image_emb"]["ob"].shape
        # the last goal-window frame is the goal step's own frame: its cached
        # embedding must equal the embedding of that raw frame
        goal_frame = live["goal"]["ob"][-1]
        direct = tiny_engine._batched_image_features(goal_frame[None], normalize=True)[0]
        np.testing.assert_allclose(item["goal_emb"]["ob"][-1], direct, atol=1e-5)
        # and both modes drew the same goal step (same rng stream position)
        cached_frame_emb = item["goal_emb"]["ob"][-1]
        row = int(np.argmin(np.linalg.norm(emb - cached_frame_emb, axis=-1)))
        live_row = int(np.argmin(np.linalg.norm(
            emb - direct, axis=-1)))
        assert row == live_row

    # GCBC trains end to end on the cached pair
    item, item5 = ds[0], ds[5]
    batch = {
        "image_emb": {"ob": jnp.asarray(np.stack([item["image_emb"]["ob"], item5["image_emb"]["ob"]]))},
        "goal_emb": {"ob": jnp.asarray(np.stack([item["goal_emb"]["ob"], item5["goal_emb"]["ob"]]))},
        "rtg": {"ob": jnp.asarray(np.stack([item["rtg"]["ob"], item5["rtg"]["ob"]]))},
        "action": jnp.asarray(np.stack([item["action"], item5["action"]]).astype(np.int32)),
        "instruct": None,
        "text_padding_mask": None,
    }
    model = GCBC(
        config_updates=dict(
            model_type="vit_debug", transfer_type="clip_vit_b16_cached",
            emb_dim=32, depth=2, num_heads=4, mlp_ratio=2,
            use_discrete_action=True, num_ensembles=2,
        ),
        num_actions=15, patch_dim=16,
    )
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    params = model.init(rngs, batch, deterministic=True)["params"]
    out = model.apply({"params": params}, batch, deterministic=True)
    assert np.isfinite(float(out["loss"]))
    # goal conditioning is live: a different goal changes the prediction
    batch2 = dict(batch, goal_emb={"ob": batch["goal_emb"]["ob"][:, ::-1] * -1.0})
    out2 = model.apply({"params": params}, batch2, deterministic=True)
    assert not np.allclose(np.asarray(out["action_pred"]), np.asarray(out2["action_pred"]))


def test_cached_gcbc_adapter_covers_goal_embeddings():
    """ADVICE r4 #4: with use_adapter, BOTH halves of the conditioning
    vector (obs emb ++ goal emb) must pass through the shared adapter —
    otherwise they live in different embedding spaces.  Captured adapter
    intermediates must show two calls (obs, goal) with the goal half's
    output actually consumed (zeroing the adapter gate changes predictions
    differently for obs-only vs obs+goal coverage)."""
    from arp_tpu.models.policy import GCBC

    rng = np.random.default_rng(9)
    W, D = 2, 64
    batch = {
        "image_emb": {"ob": jnp.asarray(rng.normal(size=(2, W, D)).astype(np.float32))},
        "goal_emb": {"ob": jnp.asarray(rng.normal(size=(2, W, D)).astype(np.float32))},
        "rtg": {"ob": jnp.asarray(rng.normal(size=(2, W, 1)).astype(np.float32))},
        "action": jnp.asarray(rng.integers(0, 15, size=(2, W)).astype(np.int32)),
        "instruct": None, "text_padding_mask": None,
    }
    model = GCBC(
        config_updates=dict(
            model_type="vit_debug", transfer_type="clip_vit_b16_cached",
            emb_dim=32, depth=2, num_heads=4, mlp_ratio=2,
            use_discrete_action=True, num_ensembles=2, use_adapter=True,
        ),
        num_actions=15, patch_dim=16,
    )
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    params = model.init(rngs, batch, deterministic=True)["params"]
    _, state = model.apply(
        {"params": params}, batch, deterministic=True,
        capture_intermediates=lambda mdl, _: "AdapterMLP" in type(mdl).__name__,
        mutable=["intermediates"],
    )
    calls = state["intermediates"]["AdapterMLP_0"]["__call__"]
    assert len(calls) == 2, f"adapter must run on obs AND goal embeddings, saw {len(calls)}"
    rows = {c.shape[0] for c in calls}
    assert rows == {2 * W}, rows  # one (B*T)-row pass per half
    from arp_tpu.models.policy import GCBC
    import pytest

    batch = {
        "image_emb": {"ob": jnp.ones((1, 4, 32), jnp.float32)},
        "rtg": {"ob": jnp.ones((1, 4, 1), jnp.float32)},
        "action": jnp.zeros((1, 4), jnp.int32),
        "goal_emb": None, "instruct": None, "text_padding_mask": None,
    }
    model = GCBC(
        config_updates=dict(
            model_type="vit_debug", transfer_type="clip_vit_b16_cached",
            emb_dim=32, depth=2, num_heads=4, mlp_ratio=2,
            use_discrete_action=True, num_ensembles=2,
        ),
        num_actions=15, patch_dim=16,
    )
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    with pytest.raises(AssertionError, match="goal"):
        model.init(rngs, batch, deterministic=True)
