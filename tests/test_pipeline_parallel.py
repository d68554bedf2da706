"""Pipeline parallelism: pipelined execution == sequential stage application."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arp_tpu.parallel.pipeline import create_pp_mesh, pipeline_apply, sequential_apply


def make_stages(num_stages, dim, seed=0):
    """Per-stage params for a dense+gelu layer, stacked on a leading stage axis."""
    rng = np.random.default_rng(seed)
    return {
        "w": jnp.asarray(rng.normal(size=(num_stages, dim, dim)).astype(np.float32) * 0.1),
        "b": jnp.asarray(rng.normal(size=(num_stages, dim)).astype(np.float32) * 0.1),
    }


def stage_fn(params, x):
    return nn.gelu(x @ params["w"] + params["b"])


@pytest.mark.parametrize("num_stages,num_microbatches", [(2, 4), (4, 4), (4, 8), (8, 8)])
def test_pipeline_matches_sequential(num_stages, num_microbatches):
    dim = 16
    batch = 16
    mesh = create_pp_mesh(num_stages)
    params = make_stages(num_stages, dim)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(batch, dim)).astype(np.float32))

    expected = sequential_apply(stage_fn, params, x)
    got = pipeline_apply(stage_fn, params, x, mesh, num_microbatches)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)


def test_pipeline_transformer_blocks():
    """Pipeline a stack of real transformer blocks (stacked params via vmap init)."""
    from arp_tpu.models.layers import Block
    from arp_tpu.ops.masks import MaskSpec

    S, b, n, d = 4, 8, 6, 32
    block = Block(dim=d, num_heads=4, mlp_ratio=2)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(b, n, d)).astype(np.float32))

    keys = jax.random.split(jax.random.PRNGKey(0), S)
    stacked = jax.vmap(lambda k: block.init(k, x[:1], deterministic=True)["params"])(keys)

    def stage(params, act):
        return block.apply({"params": params}, act, deterministic=True, mask_spec=MaskSpec("causal"))

    mesh = create_pp_mesh(S)
    expected = sequential_apply(stage, stacked, x)
    got = pipeline_apply(stage, stacked, x, mesh, num_microbatches=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-4)


def test_pipelined_transformer_remat_parity():
    """PipelinedTransformer(remat=True) — jax.checkpoint under the stage scan —
    matches the non-remat forward and gradients exactly."""
    from arp_tpu.models.layers import PipelinedTransformer
    from arp_tpu.parallel.pipeline import create_pp_mesh

    mesh = create_pp_mesh(2)
    kw = dict(emb_dim=32, depth=4, num_heads=4, mlp_ratio=2, stages=2, microbatches=2, mesh=mesh)
    base = PipelinedTransformer(**kw)
    rmt = PipelinedTransformer(**kw, remat=True)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(4, 6, 32)).astype(np.float32))
    params = base.init(jax.random.PRNGKey(0), x, deterministic=True)["params"]

    out = base.apply({"params": params}, x, deterministic=True)
    out_r = rmt.apply({"params": params}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_r))

    def loss(model):
        return lambda p: jnp.sum(model.apply({"params": p}, x, deterministic=True) ** 2)

    g = jax.grad(loss(base))(params)
    g_r = jax.grad(loss(rmt))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5), g, g_r
    )
