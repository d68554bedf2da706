"""jit-compiled train / eval step factories over a device mesh.

Replaces the reference's pmap step functions (arp_dt/main_procgen.py:104-168)
with GSPMD: inputs are committed to the mesh up front (``shard_train_state`` /
``shard_batch``) and the step is a single ``jax.jit`` through which those
shardings propagate; XLA inserts the gradient all-reduce over ICI (and param
all-gathers under fsdp) automatically.  The donated train state keeps
optimizer memory in place (reference donates pmap buffers the same way via
``donate_argnums``).

Also provides gradient accumulation via ``lax.scan`` over microbatches —
the reference ships an unused helper (m3ae/jax_utils.py:85-104); here it is a
first-class option.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding



def l2_weight_penalty(params) -> jnp.ndarray:
    """0.5 * sum ||W||^2 over matrices (ndim>1), as in main_procgen.py:114-117.

    Leaves under ``stacked_blocks`` (the pipelined transformer's param layout)
    carry two extra stacking dims, so their per-layer rank is ndim-2 — the
    same weights must be penalized identically in flat and stacked layouts.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    total = 0.0
    for path, x in flat:
        stacked = any("stacked_blocks" in str(getattr(p, "key", "")) for p in path)
        rank = x.ndim - 2 if stacked else x.ndim
        if rank > 1:
            total += jnp.sum(x.astype(jnp.float32) ** 2)
    return total


def make_train_step(
    loss_fn: Callable,
    mesh,
    *,
    weight_decay: float = 0.0,
    learning_rate_fn: Optional[Callable] = None,
    accum_steps: int = 1,
    donate: bool = True,
):
    """Build a jitted train step.

    ``loss_fn(params, batch, rng) -> (loss, aux_dict)`` must be pure.
    Returns ``step(state, batch, rng) -> (new_state, aux)``.

    Device placement is NOT enforced here: commit the state with
    :func:`shard_train_state` and batches with ``shard_batch`` first — GSPMD
    then propagates those shardings through the jitted step (and inserts the
    gradient reductions).  ``mesh`` is accepted so callers build the step in
    the same breath as the mesh; it is intentionally unused beyond that.
    """

    def _loss_with_penalty(params, batch, rng):
        loss, aux = loss_fn(params, batch, rng)
        if weight_decay > 0.0:
            weight_l2 = l2_weight_penalty(params)
            penalty = weight_decay * 0.5 * weight_l2
            loss = loss + penalty
            aux = dict(aux, weight_penalty=penalty, weight_l2=weight_l2)
        aux = dict(aux, loss=loss)
        return loss, aux

    grad_fn = jax.value_and_grad(_loss_with_penalty, has_aux=True)

    def _accumulate(params, batch, rng):
        if accum_steps == 1:
            (_, aux), grads = grad_fn(params, batch, rng)
            return grads, aux

        def microbatch(i, x):
            return jax.tree_util.tree_map(
                lambda a: a.reshape(accum_steps, -1, *a.shape[1:])[i], x
            )

        def body(carry, i):
            grads_acc, aux_acc = carry
            (_, aux), grads = grad_fn(params, microbatch(i, batch), jax.random.fold_in(rng, i))
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            aux_acc = jax.tree_util.tree_map(jnp.add, aux_acc, aux)
            return (grads_acc, aux_acc), None

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        (_, aux0), g0 = jax.eval_shape(
            lambda p, b, r: grad_fn(p, b, r), params, microbatch(0, batch), rng
        )
        zero_aux = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), aux0)
        (grads, aux), _ = jax.lax.scan(
            body, (zero_grads, zero_aux), jnp.arange(accum_steps)
        )
        inv = 1.0 / accum_steps
        grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
        aux = jax.tree_util.tree_map(lambda a: a * inv, aux)
        return grads, aux

    def train_step(state, batch, rng):
        grads, aux = _accumulate(state.params, batch, rng)
        new_state = state.apply_gradients(grads=grads)
        aux["train_state_step"] = state.step
        if learning_rate_fn is not None:
            aux["learning_rate"] = learning_rate_fn(state.step)
        return new_state, aux

    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)


def make_eval_step(loss_fn: Callable):
    """Build a jitted eval step: ``step(state, batch, rng) -> aux``."""

    def eval_step(state, batch, rng):
        _, aux = loss_fn(state.params, batch, rng)
        return aux

    return jax.jit(eval_step)


def state_shardings(state, mesh):
    """Rule-derived NamedShardings for a full train state pytree.

    Optimizer slots (adam mu/nu) mirror the param tree, so the same name-based
    rules apply through their paths; anything unmatched is replicated.
    """
    import numpy as np

    from .mesh import _spec_for

    dp, fsdp, tp = mesh.shape["dp"], mesh.shape["fsdp"], mesh.shape["tp"]
    flat, treedef = jax.tree_util.tree_flatten_with_path(state)
    shardings = []
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", getattr(p, "name", getattr(p, "idx", p)))) for p in path)
        shardings.append(NamedSharding(mesh, _spec_for(name, np.shape(leaf), dp, fsdp, tp)))
    return jax.tree_util.tree_unflatten(treedef, shardings)


def shard_train_state(state, mesh):
    """Move a (host or single-device) train state onto the mesh.

    This is the GSPMD equivalent of the reference's ``jax_utils.replicate`` +
    psum sync trick (main_procgen.py:94-101, 509-517), except params/opt state
    can be *sharded* (fsdp/tp), not just replicated.
    """
    return jax.device_put(state, state_shardings(state, mesh))
