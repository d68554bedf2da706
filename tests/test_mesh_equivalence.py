"""Parallelism correctness: ARPDT training is mesh-invariant.

The same batch + seed must produce (numerically) the same updated parameters
whether the step runs data-parallel over 8 devices or sharded dp=2 x fsdp=2 x
tp=2 — i.e. the GSPMD sharding rules change the schedule, never the math.
Also checks determinism: identical runs give identical results.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training.train_state import TrainState

from arp_tpu.models.policy import ARPDT
from arp_tpu.parallel import MeshConfig, create_mesh, make_train_step, shard_batch
from arp_tpu.parallel.step import shard_train_state

CFG = dict(
    model_type="vit_debug",
    transfer_type="none",
    emb_dim=64,
    depth=2,
    num_heads=4,
    mlp_ratio=2,
    use_discrete_action=True,
    num_ensembles=2,
)


def _setup():
    model = ARPDT(config_updates=CFG, num_actions=15, patch_dim=16)
    rng = np.random.default_rng(0)
    batch = {
        "image": {"ob": rng.normal(size=(16, 2, 32, 32, 3)).astype(np.float32)},
        "rtg": {"ob": rng.normal(size=(16, 2, 1)).astype(np.float32)},
        "action": rng.integers(0, 15, size=(16, 2)).astype(np.int32),
        "goal": None,
        "instruct": None,
        "text_padding_mask": None,
    }
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    small = jax.tree_util.tree_map(lambda x: x[:1] if hasattr(x, "shape") else x, batch)
    params = model.init(rngs, small, deterministic=True)["params"]
    # SGD isolates gradient correctness: adam's eps-normalized updates
    # amplify benign reduction-order noise on near-zero gradients by orders
    # of magnitude, which would make the comparison meaningless.
    state = TrainState.create(
        apply_fn=model.apply,
        params=params,
        tx=optax.chain(optax.clip_by_global_norm(10.0), optax.sgd(0.1)),
    )

    def loss_fn(params, b, rng):
        out = model.apply({"params": params}, b, deterministic=True)
        return out["loss"], {"acc": out["acc"]}

    return model, state, batch, loss_fn


def _train(mesh_cfg, steps=3):
    model, state, batch, loss_fn = _setup()
    mesh = create_mesh(mesh_cfg)
    with mesh:
        step = make_train_step(loss_fn, mesh, weight_decay=1e-4, donate=False)
        gstate = shard_train_state(state, mesh)
        gbatch = shard_batch(batch, mesh)
        for i in range(steps):
            gstate, aux = step(gstate, gbatch, jax.random.PRNGKey(i))
    return jax.device_get(gstate.params), float(aux["loss"])


def test_dp_vs_fsdp_tp_equivalence():
    params_dp, loss_dp = _train(MeshConfig(dp=-1))
    params_sharded, loss_sharded = _train(MeshConfig(dp=2, fsdp=2, tp=2))
    assert abs(loss_dp - loss_sharded) < 1e-4
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4),
        params_dp,
        params_sharded,
    )


def test_training_is_deterministic():
    p1, l1 = _train(MeshConfig(dp=-1))
    p2, l2 = _train(MeshConfig(dp=-1))
    assert l1 == l2
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), p1, p2
    )


def test_dp_vs_dp_pp_equivalence():
    """dp4 x pp2 (pipelined policy stack) trains identically to pure dp8.

    The pp run uses the PipelinedTransformer (stacked block params flowing
    through ppermute microbatches); its updated params are unstacked back to
    the flat layout for comparison.
    """
    from arp_tpu.models.layers import stack_transformer_params, unstack_transformer_params

    params_dp, loss_dp = _train(MeshConfig(dp=-1))

    model, state, batch, _ = _setup()
    mesh = create_mesh(MeshConfig(dp=4, pp=2))
    pp_model = ARPDT(
        config_updates=dict(CFG, pp_stages=2, pp_microbatches=2),
        num_actions=15,
        patch_dim=16,
        mesh=mesh,
    )
    pp_params = dict(state.params)
    pp_params["policy"] = stack_transformer_params(state.params["policy"], 2)
    pp_state = TrainState.create(apply_fn=pp_model.apply, params=pp_params, tx=state.tx)

    def pp_loss_fn(params, b, rng):
        out = pp_model.apply({"params": params}, b, deterministic=True)
        return out["loss"], {"acc": out["acc"]}

    with mesh:
        step = make_train_step(pp_loss_fn, mesh, weight_decay=1e-4, donate=False)
        gstate = shard_train_state(pp_state, mesh)
        gbatch = shard_batch(batch, mesh)
        for i in range(3):
            gstate, aux = step(gstate, gbatch, jax.random.PRNGKey(i))
    got = jax.device_get(gstate.params)
    got = dict(got)
    got["policy"] = unstack_transformer_params(got["policy"])

    assert abs(loss_dp - float(aux["loss"])) < 1e-4
    flat_want = jax.tree_util.tree_flatten_with_path(params_dp)[0]
    flat_got = dict(jax.tree_util.tree_flatten_with_path(got)[0])
    # same structure after unstacking
    assert set(flat_got) == {p for p, _ in flat_want}
    for path, want in flat_want:
        np.testing.assert_allclose(
            np.asarray(flat_got[path]), np.asarray(want), atol=2e-4, err_msg=str(path)
        )


def test_dp_vs_multislice_dcn_equivalence():
    """dcn_dp=2 x dp=4 (multislice layout: DCN factor outermost in the dp
    axis) trains identically to flat dp8 — the logical program is unchanged,
    only collective routing differs."""
    params_dp, loss_dp = _train(MeshConfig(dp=-1))
    params_ms, loss_ms = _train(MeshConfig(dp=-1, dcn_dp=2))
    assert abs(loss_dp - loss_ms) < 1e-4
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4),
        params_dp,
        params_ms,
    )
