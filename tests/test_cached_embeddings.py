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
