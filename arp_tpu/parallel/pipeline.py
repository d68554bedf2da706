"""Pipeline parallelism: GPipe-style microbatched layer pipelining.

The reference has no pipeline parallelism (SURVEY §2.5); this provides the
missing scaling axis for deep stacks that exceed tp+fsdp reach.  Classic
collective-permute pipeline (the "How to Scale Your Model" recipe): the layer
stack is split into S stages sharded over a ``pp`` mesh axis; microbatches
flow stage-to-stage via ``lax.ppermute`` inside a ``lax.scan`` over
M + S - 1 ticks, so all stages stay busy after the fill phase.

Works with any per-stage function of signature ``fn(stage_params, x) -> x``
(e.g. a chunk of transformer blocks with stacked params).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def create_pp_mesh(num_stages: int, devices=None) -> Mesh:
    """1-D pp-only mesh over the first ``num_stages`` devices.

    A standalone-primitive helper (tests, demos). The trainer composes pp
    with dp/fsdp via MeshConfig instead, which uses every device.
    """
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= num_stages, (len(devices), num_stages)
    arr = np.asarray(devices[:num_stages]).reshape(num_stages)
    return Mesh(arr, axis_names=("pp",))


def pipeline_apply(
    stage_fn: Callable,
    stage_params,
    x,
    mesh: Mesh,
    num_microbatches: int,
):
    """Run x through S pipelined stages over the mesh's ``pp`` axis.

    Args:
      stage_fn: fn(per_stage_params, activation) -> activation; applied once
        per stage (params for stage s are ``tree_map(lambda p: p[s], ...)``
        of ``stage_params``).
      stage_params: pytree with a leading stage axis of size S on every leaf.
      x: (batch, ...) activations; batch must divide num_microbatches.
      mesh: a Mesh containing a "pp" axis of size S.  When the mesh also has
        dp/fsdp axes (the trainer's 4-axis mesh), the batch stays sharded
        over them inside the pipeline — each dp slice pipelines its own
        microbatches and ppermute rides the pp axis only.

    Returns activations with the same shape as x, equal to sequentially
    applying all S stages.
    """
    S = mesh.shape["pp"]
    b = x.shape[0]
    assert b % num_microbatches == 0
    mb = b // num_microbatches
    x_mb = x.reshape((num_microbatches, mb) + x.shape[1:])

    params_spec = jax.tree_util.tree_map(lambda _: P("pp"), stage_params)
    data_axes = tuple(a for a in ("dp", "fsdp") if a in mesh.shape and mesh.shape[a] > 1)
    data_size = int(np.prod([mesh.shape[a] for a in data_axes])) if data_axes else 1
    if mb % data_size != 0:
        data_axes = ()  # tiny batches (e.g. init probes) run replicated
    x_spec = P(None, data_axes if data_axes else None, *([None] * (x.ndim - 1)))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(params_spec, x_spec),
        out_specs=x_spec,
        check_rep=False,
    )
    def run(local_params, x_mb):
        # local_params leaves have leading dim 1 (this stage's slice)
        local_params = jax.tree_util.tree_map(lambda p: p[0], local_params)
        s = lax.axis_index("pp")
        M = x_mb.shape[0]
        T = M + S - 1
        perm = [(i, (i + 1) % S) for i in range(S)]

        state = jnp.zeros_like(x_mb[0])
        outputs = jnp.zeros_like(x_mb)

        def tick(carry, t):
            state, outputs = carry
            # stage 0 ingests microbatch t (clamped; invalid ticks are ignored
            # because their outputs never get written)
            feed = x_mb[jnp.clip(t, 0, M - 1)]
            inp = jnp.where(s == 0, feed, state)
            out = stage_fn(local_params, inp)
            # the LAST stage emits microbatch (t - S + 1) at tick t
            out_idx = t - (S - 1)
            is_last = s == S - 1
            valid = jnp.logical_and(is_last, out_idx >= 0)
            outputs = lax.cond(
                valid,
                lambda o: lax.dynamic_update_index_in_dim(o, out, jnp.maximum(out_idx, 0), 0),
                lambda o: o,
                outputs,
            )
            state = lax.ppermute(out, "pp", perm)
            return (state, outputs), None

        (state, outputs), _ = lax.scan(tick, (state, outputs), jnp.arange(T))
        # only the last stage holds real outputs; psum broadcasts them
        outputs = jnp.where(s == S - 1, outputs, jnp.zeros_like(outputs))
        return lax.psum(outputs, "pp")

    out = run(stage_params, x_mb)
    return out.reshape((b,) + x.shape[1:])


def sequential_apply(stage_fn: Callable, stage_params, x):
    """Reference semantics: apply the S stages one after another."""
    S = jax.tree_util.tree_leaves(stage_params)[0].shape[0]
    for s in range(S):
        params_s = jax.tree_util.tree_map(lambda p: p[s], stage_params)
        x = stage_fn(params_s, x)
    return x
