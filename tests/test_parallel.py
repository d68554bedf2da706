"""Mesh / sharding / train-step tests on the virtual 8-device CPU mesh."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax.training.train_state import TrainState
from jax.sharding import PartitionSpec as P

from arp_tpu.parallel import MeshConfig, create_mesh, make_train_step, partition_params, shard_batch
from arp_tpu.parallel.step import make_eval_step, shard_train_state


class TinyModel(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Dense(128, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(1, name="fc2")(x)


def _make_state(tx=None):
    model = TinyModel()
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 64)))["params"]
    tx = tx or optax.adamw(1e-3)
    return model, TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def test_mesh_shapes():
    mesh = create_mesh(MeshConfig(dp=-1, fsdp=1, tp=1))
    assert mesh.shape["dp"] == 8
    mesh = create_mesh(MeshConfig(dp=2, fsdp=2, tp=2))
    assert (mesh.shape["dp"], mesh.shape["fsdp"], mesh.shape["tp"]) == (2, 2, 2)


def test_partition_params_tp_rules():
    mesh = create_mesh(MeshConfig(dp=2, fsdp=2, tp=2))
    params = {
        "blocks_0": {
            "attn": {"qkv": {"kernel": jnp.zeros((128, 384))}, "attn_out": {"kernel": jnp.zeros((128, 128))}},
            "mlp": {"fc1": {"kernel": jnp.zeros((128, 512))}, "fc2": {"kernel": jnp.zeros((512, 128))}},
        },
        "head": {"kernel": jnp.zeros((128, 64)), "bias": jnp.zeros((3,))},
        # below the ZeRO-3 floor (_FSDP_MIN_ELEMENTS): must stay replicated —
        # fsdp-sharding a 32x32 contracting dim provoked GSPMD involuntary
        # full rematerialization in the round-4 flagship dryrun
        "adapter": {"kernel": jnp.zeros((32, 32))},
    }
    sh = partition_params(params, mesh)
    assert sh["blocks_0"]["attn"]["qkv"]["kernel"].spec == P("fsdp", "tp")
    assert sh["blocks_0"]["mlp"]["fc1"]["kernel"].spec == P("fsdp", "tp")
    assert sh["blocks_0"]["mlp"]["fc2"]["kernel"].spec == P("tp", "fsdp")
    assert sh["blocks_0"]["attn"]["attn_out"]["kernel"].spec == P("tp", "fsdp")
    assert sh["head"]["kernel"].spec == P("fsdp", None)  # 8192 elems >= floor
    assert sh["head"]["bias"].spec == P()
    assert sh["adapter"]["kernel"].spec == P()  # 1024 elems < floor


def test_train_step_dp_matches_single_device():
    """A dp=8 sharded step must produce the same update as single-device."""
    mesh = create_mesh(MeshConfig(dp=-1))
    model, state = _make_state(optax.sgd(0.1))

    x = np.random.default_rng(0).normal(size=(16, 64)).astype(np.float32)
    y = np.random.default_rng(1).normal(size=(16, 1)).astype(np.float32)

    def loss_fn(params, batch, rng):
        pred = model.apply({"params": params}, batch["x"])
        loss = jnp.mean((pred - batch["y"]) ** 2)
        return loss, {"mse": loss}

    # Single-device ground truth.
    grads = jax.grad(lambda p: loss_fn(p, {"x": x, "y": y}, None)[0])(state.params)
    expected = state.apply_gradients(grads=grads).params

    with mesh:
        step = make_train_step(loss_fn, mesh)
        gstate = shard_train_state(state, mesh)
        gbatch = shard_batch({"x": x, "y": y}, mesh)
        new_state, aux = step(gstate, gbatch, jax.random.PRNGKey(0))

    got = jax.device_get(new_state.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5), got, jax.device_get(expected)
    )
    assert "loss" in aux


def test_train_step_fsdp_tp_runs():
    mesh = create_mesh(MeshConfig(dp=2, fsdp=2, tp=2))
    model, state = _make_state()

    def loss_fn(params, batch, rng):
        pred = model.apply({"params": params}, batch["x"])
        loss = jnp.mean((pred - batch["y"]) ** 2)
        return loss, {"mse": loss}

    x = np.ones((8, 64), np.float32)
    y = np.ones((8, 1), np.float32)
    with mesh:
        step = make_train_step(loss_fn, mesh, weight_decay=1e-4)
        gstate = shard_train_state(state, mesh)
        gbatch = shard_batch({"x": x, "y": y}, mesh)
        new_state, aux = step(gstate, gbatch, jax.random.PRNGKey(0))
        eval_step = make_eval_step(loss_fn)
        aux2 = eval_step(new_state, gbatch, jax.random.PRNGKey(1))
    assert np.isfinite(float(aux["loss"]))
    assert np.isfinite(float(aux2["mse"]))


def test_grad_accumulation_matches_full_batch():
    mesh = create_mesh(MeshConfig(dp=-1))
    model, state = _make_state(optax.sgd(0.1))

    def loss_fn(params, batch, rng):
        pred = model.apply({"params": params}, batch["x"])
        loss = jnp.mean((pred - batch["y"]) ** 2)
        return loss, {"mse": loss}

    x = np.random.default_rng(2).normal(size=(16, 64)).astype(np.float32)
    y = np.random.default_rng(3).normal(size=(16, 1)).astype(np.float32)
    with mesh:
        full = make_train_step(loss_fn, mesh, donate=False)
        accum = make_train_step(loss_fn, mesh, accum_steps=2, donate=False)
        gstate = shard_train_state(state, mesh)
        gbatch = shard_batch({"x": x, "y": y}, mesh)
        s_full, _ = full(gstate, gbatch, jax.random.PRNGKey(0))
        s_acc, _ = accum(gstate, gbatch, jax.random.PRNGKey(0))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5),
        jax.device_get(s_full.params),
        jax.device_get(s_acc.params),
    )


def test_multislice_fallback_is_loud(caplog):
    """No slice_index on devices (CPU/single-slice): dcn_dp emulation must
    warn loudly; with slice-indexed devices a hybrid-mesh failure must raise
    instead of silently degrading the DCN layout (VERDICT r2 weak #6)."""
    import logging as _logging

    from arp_tpu.parallel.mesh import MeshConfig, create_mesh

    with caplog.at_level(_logging.WARNING):
        mesh = create_mesh(MeshConfig(dp=-1, dcn_dp=2))
    assert mesh.shape["dp"] == 8
    assert any("slice_index" in r.getMessage() for r in caplog.records)

    class Dev:  # slice-carrying stand-ins the hybrid builder cannot handle
        def __init__(self, i):
            self.id = i
            self.slice_index = i // 4

    caplog.clear()
    with caplog.at_level(_logging.WARNING):
        with pytest.raises(Exception):
            create_mesh(MeshConfig(dp=-1, dcn_dp=2), devices=[Dev(i) for i in range(8)])
    # the raise must come from the HYBRID branch, not a silent fallback that
    # failed later: no contiguous-emulation warning may have fired
    assert not any("slice_index" in r.getMessage() for r in caplog.records)


def test_mesh_from_count_contract():
    """--mesh_dp semantics: 0 -> no mesh, -1 -> all devices, N -> first N
    (NOT 'all devices with dp=N', which asserts unless N == device count)."""
    from arp_tpu.parallel import mesh_from_count

    assert mesh_from_count(0) is None
    assert mesh_from_count(-1).devices.size == 8
    m4 = mesh_from_count(4)
    assert m4.devices.size == 4 and m4.shape["dp"] == 4
    with pytest.raises(AssertionError, match="have 8"):
        mesh_from_count(9)
