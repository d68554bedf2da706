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
