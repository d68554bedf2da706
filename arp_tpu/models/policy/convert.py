"""Reference policy-checkpoint converter (arp_dt ARPDT/BC/GCBC -> arp_tpu).

Lets users of the reference load their trained pickles directly.  Mapping
notes:

  * the reference's policy transformer uses auto-generated names
    (policy/Block_i/Attention_0/Dense_0 ...) -> our named tree
    (policy/blocks_i/attn/qkv ...);
  * the reference's "ensemble" heads are ``[nn.Sequential(...)] * N`` —
    a list of ONE module instance, which flax deduplicates to a single
    parameter set (observable in its trees: only ``action_outputs_0``
    exists).  All N "members" are therefore identical and the ensemble mean
    is the identity.  We broadcast that single head into every slot of our
    vmapped EnsembleHeads, which reproduces the reference output exactly
    (train further and the members will finally diverge).
"""

from __future__ import annotations

import flax
import jax.numpy as jnp
import numpy as np

from ..m3ae import convert_reference_m3ae_params


def convert_reference_policy_params(ref_params, num_ensembles: int = 5):
    """Map reference ARPDT/BC/GCBC params onto the arp_tpu policy tree."""
    ref_params = flax.core.unfreeze(ref_params)
    if "params" in ref_params:
        ref_params = ref_params["params"]

    out_flat = {}

    # shared transformer (reuse the auto-name mapper; it understands the
    # Block_i/Attention_0/FeedForward_0 naming and the trailing LayerNorm)
    if "policy" in ref_params:
        mapped = convert_reference_m3ae_params({"policy": ref_params.pop("policy")})
        mapped = flax.traverse_util.flatten_dict(flax.core.unfreeze(mapped)["params"])
        # the final LayerNorm_0 under 'policy' becomes 'norm'
        for path, v in mapped.items():
            path = tuple("norm" if p == "LayerNorm_0" else p for p in path)
            out_flat[path] = v

    def convert_heads(prefix: str):
        head0 = ref_params.pop(f"{prefix}_0", None)
        if head0 is None:
            return
        # drop the other aliases if a checkpoint somehow materialized them
        for i in range(1, num_ensembles):
            ref_params.pop(f"{prefix}_{i}", None)
        flat = flax.traverse_util.flatten_dict(head0)
        layer_map = {"layers_0": "Dense_0", "layers_2": "Dense_1"}
        unknown = sorted({p[0] for p in flat if p[0] not in layer_map})
        if unknown:
            # reference checkpoints trained with output_head_depth > 0 carry
            # deeper MLP heads this 2-layer mapper does not cover yet — fail
            # loudly rather than KeyError mid-conversion or silently
            # passing leaves through unconverted
            raise NotImplementedError(
                f"head {prefix!r} has unmapped layers {unknown}: checkpoints "
                "with output_head_depth > 0 need the head mapper extended "
                "(models/policy/convert.py)"
            )
        for path, v in flat.items():
            # layers_0 -> Dense_0, layers_2 -> Dense_1 (relu is not a module)
            name = layer_map[path[0]]
            tiled = jnp.broadcast_to(
                jnp.asarray(v)[None], (num_ensembles,) + np.shape(v)
            )
            out_flat[(prefix, "heads", name) + path[1:]] = tiled

    convert_heads("action_outputs")
    convert_heads("return_outputs")

    # identically named leaves (action_input, rtg_input, state_input,
    # patch_emb, image_text_input, residual_weight, adapters, impala, ...)
    for path, v in flax.traverse_util.flatten_dict(ref_params).items():
        out_flat[path] = jnp.asarray(v)

    return flax.core.freeze({"params": flax.traverse_util.unflatten_dict(out_flat)})


def export_reference_policy_params(params, ensemble_mode: str = "require_tied"):
    """Inverse of :func:`convert_reference_policy_params`: arp_tpu -> reference.

    Produces a param tree the reference's own ARPDT/BC/GCBC models accept
    (auto-generated names: ``policy/Block_i/Attention_0/Dense_0``, deduped
    ``action_outputs_0`` head), so policies trained here can be evaluated or
    resumed with the reference tooling (arp_dt/local_run_procgen.py:285-308).

    The reference's "ensemble" is N aliases of ONE module instance (see the
    module docstring above), so genuinely diverged arp_tpu ensemble members
    have no exact reference representation.  ``ensemble_mode`` picks the
    collapse:

      * ``"require_tied"`` (default): raise unless every member is identical
        — the export is then exact (reference-imported or freshly-broadcast
        checkpoints satisfy this).
      * ``"first"``: export member 0.
      * ``"mean"``: export the parameter mean (approximates, but does not
        equal, the ensemble's output mean through the nonlinear head).
    """
    if ensemble_mode not in ("require_tied", "first", "mean"):
        raise ValueError(f"unknown ensemble_mode {ensemble_mode!r}")
    params = flax.core.unfreeze(params)
    if "params" in params:
        params = params["params"]
    params = dict(params)

    out_flat = {}

    def export_heads(prefix: str):
        tree = params.pop(prefix, None)
        if tree is None:
            return
        flat = flax.traverse_util.flatten_dict(tree)
        layer_map = {"Dense_0": "layers_0", "Dense_1": "layers_2"}
        for path, v in flat.items():
            # path = ("heads", "Dense_i", leaf); leading dim = ensemble
            if path[0] != "heads" or path[1] not in layer_map:
                raise NotImplementedError(
                    f"head {prefix!r} has unmapped subtree {path}: only the "
                    "2-layer EnsembleHeads layout is exportable "
                    "(models/policy/convert.py)"
                )
            v = np.asarray(v)
            if ensemble_mode == "require_tied":
                if not all(np.array_equal(v[0], v[i]) for i in range(1, v.shape[0])):
                    raise ValueError(
                        f"{prefix}/{'/'.join(path)}: ensemble members have "
                        "diverged; the reference head cannot represent them "
                        "exactly — re-export with ensemble_mode='first' or "
                        "'mean' (lossy collapse)"
                    )
                member = v[0]
            elif ensemble_mode == "first":
                member = v[0]
            else:
                member = v.mean(axis=0)
            out_flat[(f"{prefix}_0", layer_map[path[1]]) + path[2:]] = jnp.asarray(member)

    export_heads("action_outputs")
    export_heads("return_outputs")

    # policy transformer: named tree -> the reference's auto-generated names
    policy = params.pop("policy", None)
    if policy is not None:
        for path, v in flax.traverse_util.flatten_dict(policy).items():
            parts = list(path)
            new_parts = []
            for i, p in enumerate(parts):
                prev_block = new_parts and new_parts[-1].startswith("Block_")
                if p.startswith("blocks_"):
                    new_parts.append("Block_" + p.split("_")[1])
                elif p == "norm1" and prev_block:
                    new_parts.append("LayerNorm_0")
                elif p == "norm2" and prev_block:
                    new_parts.append("LayerNorm_1")
                elif p == "attn" and prev_block:
                    new_parts.append("Attention_0")
                elif p == "mlp" and prev_block:
                    new_parts.append("FeedForward_0")
                elif p == "qkv" and new_parts and new_parts[-1] == "Attention_0":
                    new_parts.append("Dense_0")
                elif p == "attn_out" and new_parts and new_parts[-1] == "Attention_0":
                    new_parts.append("Dense_1")
                elif p == "norm" and i == 0:
                    # the Transformer's trailing LayerNorm
                    new_parts.append("LayerNorm_0")
                else:
                    new_parts.append(p)
            out_flat[("policy",) + tuple(new_parts)] = jnp.asarray(v)

    # identically named leaves pass through (action_input, rtg_input,
    # patch_emb, adapters, impala, frozen-encoder subtrees, ...)
    for path, v in flax.traverse_util.flatten_dict(params).items():
        out_flat[path] = jnp.asarray(v)

    return flax.core.freeze(flax.traverse_util.unflatten_dict(out_flat))
