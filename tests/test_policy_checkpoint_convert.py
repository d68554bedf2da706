"""Reference policy checkpoint interop: converted params reproduce outputs.

Loads the reference's ARPDT/BC (pure JAX, with stubbed wandb) from
/root/reference, random-inits it, converts the params with
convert_reference_policy_params, and requires identical action/return
predictions and losses from the arp_tpu models.
"""

import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arp_tpu.models.policy import ARPDT, BC
from arp_tpu.models.policy.convert import convert_reference_policy_params

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_models():
    if not os.path.exists(os.path.join(REF, "arp_dt")):
        pytest.skip("reference repo not mounted")
    sys.modules.setdefault("wandb", types.ModuleType("wandb"))
    if not hasattr(jax, "tree_map"):
        jax.tree_map = jax.tree.map
    sys.path.insert(0, REF)
    from arp_dt.ARPDT import ARPDT as RefARPDT
    from arp_dt.BC import BC as RefBC

    return RefARPDT, RefBC


CFG = dict(
    model_type="vit_debug",
    transfer_type="none",
    emb_dim=32,
    depth=2,
    num_heads=4,
    mlp_ratio=2,
    use_discrete_action=True,
    num_ensembles=3,
)


def make_batch(with_rtg=True):
    rng = np.random.default_rng(0)
    batch = {
        "image": {"ob": jnp.asarray(rng.normal(size=(2, 2, 32, 32, 3)).astype(np.float32))},
        "action": jnp.asarray(rng.integers(0, 15, size=(2, 2)).astype(np.int32)),
        "instruct": None,
        "text_padding_mask": None,
    }
    if with_rtg:
        batch["rtg"] = {"ob": jnp.asarray(rng.normal(size=(2, 2, 1)).astype(np.float32))}
    return batch


def test_arpdt_checkpoint_interop(ref_models):
    RefARPDT, _ = ref_models
    batch = make_batch()
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}

    ref_model = RefARPDT(config_updates=CFG, num_actions=15, patch_dim=16)
    ref_params = ref_model.init(rngs, batch, deterministic=True)["params"]
    ref_out = ref_model.apply({"params": ref_params}, batch, deterministic=True)

    my_model = ARPDT(config_updates=CFG, num_actions=15, patch_dim=16)
    my_params = convert_reference_policy_params(ref_params, num_ensembles=3)
    my_out = my_model.apply(my_params, batch, deterministic=True)

    np.testing.assert_allclose(
        np.asarray(my_out["action_pred"]), np.asarray(ref_out["action_pred"]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(my_out["return_pred"]), np.asarray(ref_out["return_pred"]), atol=1e-4
    )
    np.testing.assert_allclose(float(my_out["loss"]), float(ref_out["loss"]), atol=1e-4)


def test_bc_checkpoint_interop(ref_models):
    _, RefBC = ref_models
    batch = make_batch(with_rtg=False)
    rngs = {"params": jax.random.PRNGKey(3), "noise": jax.random.PRNGKey(4), "dropout": jax.random.PRNGKey(5)}

    ref_model = RefBC(config_updates=CFG, num_actions=15, patch_dim=16)
    ref_params = ref_model.init(rngs, batch, deterministic=True)["params"]
    ref_out = ref_model.apply({"params": ref_params}, batch, deterministic=True)

    my_model = BC(config_updates=CFG, num_actions=15, patch_dim=16)
    my_params = convert_reference_policy_params(ref_params, num_ensembles=3)
    my_out = my_model.apply(my_params, batch, deterministic=True)

    np.testing.assert_allclose(
        np.asarray(my_out["action_pred"]), np.asarray(ref_out["action_pred"]), atol=1e-4
    )


def test_reference_ensembles_share_params(ref_models):
    """Documents the reference quirk: [module]*N dedupes to ONE head."""
    RefARPDT, _ = ref_models
    batch = make_batch()
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    ref_model = RefARPDT(config_updates=CFG, num_actions=15, patch_dim=16)
    ref_params = ref_model.init(rngs, batch, deterministic=True)["params"]
    assert "action_outputs_0" in ref_params
    assert "action_outputs_1" not in ref_params
