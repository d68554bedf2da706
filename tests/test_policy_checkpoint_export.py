"""Reverse checkpoint interop: arp_tpu params exported to the reference format.

Round-trips params through export_reference_policy_params and requires the
reference's own ARPDT (imported from /root/reference, random-inited) to
produce identical outputs from the exported tree — the mirror image of
tests/test_policy_checkpoint_convert.py.  Also drives the file-level
save_reference_checkpoint -> load_reference_checkpoint cycle.
"""

import os
import sys
import types

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arp_tpu.checkpoint import load_reference_checkpoint, save_reference_checkpoint
from arp_tpu.models.policy import ARPDT
from arp_tpu.models.policy.convert import (
    convert_reference_policy_params,
    export_reference_policy_params,
)

REF = "/root/reference"

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


@pytest.fixture(scope="module")
def ref_arpdt():
    if not os.path.exists(os.path.join(REF, "arp_dt")):
        pytest.skip("reference repo not mounted")
    sys.modules.setdefault("wandb", types.ModuleType("wandb"))
    if not hasattr(jax, "tree_map"):
        jax.tree_map = jax.tree.map
    sys.path.insert(0, REF)
    from arp_dt.ARPDT import ARPDT as RefARPDT

    return RefARPDT


def make_batch():
    rng = np.random.default_rng(0)
    return {
        "image": {"ob": jnp.asarray(rng.normal(size=(2, 2, 32, 32, 3)).astype(np.float32))},
        "action": jnp.asarray(rng.integers(0, 15, size=(2, 2)).astype(np.int32)),
        "instruct": None,
        "text_padding_mask": None,
        "rtg": {"ob": jnp.asarray(rng.normal(size=(2, 2, 1)).astype(np.float32))},
    }


def init_mine():
    rngs = {
        "params": jax.random.PRNGKey(0),
        "noise": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    model = ARPDT(config_updates=CFG, num_actions=15, patch_dim=16)
    params = model.init(rngs, make_batch(), deterministic=True)
    return model, params


def tie_ensembles(params):
    """Broadcast member 0 of every ensemble head — the reference-representable case."""
    params = flax.core.unfreeze(params)
    flat = flax.traverse_util.flatten_dict(params)
    for path, v in flat.items():
        if "heads" in path:
            flat[path] = jnp.broadcast_to(v[:1], v.shape)
    return flax.core.freeze(flax.traverse_util.unflatten_dict(flat))


def test_export_reproduces_outputs_in_reference_model(ref_arpdt):
    """Tied-ensemble arp_tpu params -> reference tree -> identical outputs."""
    batch = make_batch()
    model, params = init_mine()
    params = tie_ensembles(params)
    my_out = model.apply(params, batch, deterministic=True)

    exported = export_reference_policy_params(params)  # require_tied default
    ref_model = ref_arpdt(config_updates=CFG, num_actions=15, patch_dim=16)
    ref_out = ref_model.apply(
        {"params": flax.core.unfreeze(exported)}, batch, deterministic=True
    )
    np.testing.assert_allclose(
        np.asarray(ref_out["action_pred"]), np.asarray(my_out["action_pred"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ref_out["return_pred"]), np.asarray(my_out["return_pred"]), atol=1e-5
    )


def test_export_tree_matches_reference_init(ref_arpdt):
    """Reference init -> convert -> export returns the exact original tree."""
    rngs = {
        "params": jax.random.PRNGKey(0),
        "noise": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    ref_model = ref_arpdt(config_updates=CFG, num_actions=15, patch_dim=16)
    ref_params = ref_model.init(rngs, make_batch(), deterministic=True)["params"]

    converted = convert_reference_policy_params(ref_params, num_ensembles=3)
    exported = export_reference_policy_params(converted)

    ref_flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(ref_params))
    exp_flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(exported))
    assert set(ref_flat) == set(exp_flat)
    for path in ref_flat:
        np.testing.assert_array_equal(
            np.asarray(ref_flat[path]), np.asarray(exp_flat[path]), err_msg="/".join(path)
        )


def test_diverged_ensembles_require_explicit_mode():
    _, params = init_mine()  # fresh init: members genuinely diverge
    with pytest.raises(ValueError, match="diverged"):
        export_reference_policy_params(params)
    first = export_reference_policy_params(params, ensemble_mode="first")
    mean = export_reference_policy_params(params, ensemble_mode="mean")
    f0 = flax.traverse_util.flatten_dict(flax.core.unfreeze(first))
    m0 = flax.traverse_util.flatten_dict(flax.core.unfreeze(mean))
    head_key = ("action_outputs_0", "layers_0", "kernel")
    assert head_key in f0
    raw = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))
    src = raw[("params", "action_outputs", "heads", "Dense_0", "kernel")]
    np.testing.assert_array_equal(np.asarray(f0[head_key]), np.asarray(src)[0])
    np.testing.assert_allclose(
        np.asarray(m0[head_key]), np.asarray(src).mean(axis=0), rtol=1e-6
    )


def test_save_reference_checkpoint_round_trips(tmp_path, ref_arpdt):
    """File-level cycle: save_reference_checkpoint -> load_reference_checkpoint.

    num_ensembles=5 so the re-ingestion (which re-broadcasts with the
    reference's default ensemble count) lands back on the same module shape.
    """
    batch = make_batch()
    cfg = dict(CFG, num_ensembles=5)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "noise": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    model = ARPDT(config_updates=cfg, num_actions=15, patch_dim=16)
    params = model.init(rngs, make_batch(), deterministic=True)
    params = tie_ensembles(params)
    my_out = model.apply(params, batch, deterministic=True)

    path = str(tmp_path / "model_best.pkl")
    save_reference_checkpoint(
        path, params, step=7, epoch=3, variant={"model_type": "vit_debug"}
    )

    # the reference eval driver reads checkpoint["state"].params
    # (local_run_procgen.py:285-308); drive its model with exactly that
    from arp_tpu.checkpoint import load_pickle

    raw = load_pickle(path)
    assert raw["step"] == 7 and raw["epoch"] == 3
    ref_model = ref_arpdt(config_updates=cfg, num_actions=15, patch_dim=16)
    ref_out = ref_model.apply({"params": raw["state"].params}, batch, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(ref_out["action_pred"]), np.asarray(my_out["action_pred"]), atol=1e-5
    )

    # and our own reference-ingestion path converts it straight back
    data = load_reference_checkpoint(path)
    back = {"params": data["state"].params}
    round_out = model.apply(back, batch, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(round_out["action_pred"]), np.asarray(my_out["action_pred"]), atol=1e-5
    )
