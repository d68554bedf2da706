"""OpenAI CLIP torch-checkpoint -> arp_tpu flax variables.

Covers both ViT and ModifiedResNet towers (reference converter:
arp_dt/models/openai/model.py:220-314 — note this implementation maps onto a
*different* flax tree: separate q/k/v/out Dense per attention, patchify as
Dense, stage blocks named ``layerS.J``).

To obtain a checkpoint in an egress-free environment, run on a connected
machine::

    import torch, numpy as np
    sd = torch.jit.load("ViT-B-16.pt", map_location="cpu").state_dict()
    np.save("vit_b16.npy", {k: v.numpy() for k, v in sd.items()})

then point ``ARP_TPU_CHECKPOINT_DIR`` at the directory holding the .npy.
"""

from __future__ import annotations

import re
from typing import Mapping

import flax
import jax.numpy as jnp
import numpy as np


def _set(tree, path, value):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = jnp.asarray(value)


def _convert_block_attn(out, prefix_path, torch_prefix, sd):
    """in_proj (3D, D) -> separate query/key/value Dense; out_proj -> out."""
    w = sd[torch_prefix + "attn.in_proj_weight"]
    b = sd[torch_prefix + "attn.in_proj_bias"]
    d = w.shape[1]
    for i, name in enumerate(("query", "key", "value")):
        _set(out, prefix_path + ["attn", name, "kernel"], w[i * d : (i + 1) * d].T)
        _set(out, prefix_path + ["attn", name, "bias"], b[i * d : (i + 1) * d])
    _set(out, prefix_path + ["attn", "out", "kernel"], sd[torch_prefix + "attn.out_proj.weight"].T)
    _set(out, prefix_path + ["attn", "out", "bias"], sd[torch_prefix + "attn.out_proj.bias"])


def _convert_transformer(out, base_path, torch_prefix, sd):
    n_blocks = 0
    while f"{torch_prefix}resblocks.{n_blocks}.ln_1.weight" in sd:
        n_blocks += 1
    for i in range(n_blocks):
        tp = f"{torch_prefix}resblocks.{i}."
        path = base_path + [f"resblocks.{i}"]
        for ln in ("ln_1", "ln_2"):
            _set(out, path + [ln, "scale"], sd[tp + ln + ".weight"])
            _set(out, path + [ln, "bias"], sd[tp + ln + ".bias"])
        _convert_block_attn(out, path, tp, sd)
        for mlp in ("c_fc", "c_proj"):
            _set(out, path + ["mlp", mlp, "kernel"], sd[tp + "mlp." + mlp + ".weight"].T)
            _set(out, path + ["mlp", mlp, "bias"], sd[tp + "mlp." + mlp + ".bias"])


def _convert_vit_visual(params, sd):
    # conv patch embed (F, C, P, P) -> Dense kernel ((P*P*C), F) matching the
    # (p_row, p_col, channel) patchify order in model.VisionTransformer.
    w = sd["visual.conv1.weight"]
    _set(params, ["visual", "conv1", "kernel"], w.transpose(2, 3, 1, 0).reshape(-1, w.shape[0]))
    _set(params, ["visual", "class_embedding"], sd["visual.class_embedding"])
    _set(params, ["visual", "positional_embedding"], sd["visual.positional_embedding"])
    for ln in ("ln_pre", "ln_post"):
        _set(params, ["visual", ln, "scale"], sd[f"visual.{ln}.weight"])
        _set(params, ["visual", ln, "bias"], sd[f"visual.{ln}.bias"])
    _convert_transformer(params, ["visual", "transformer"], "visual.transformer.", sd)
    if "visual.proj" in sd:
        _set(params, ["visual", "proj", "kernel"], sd["visual.proj"])


def _convert_resnet_visual(params, batch_stats, sd):
    def conv(path, key):
        _set(params, path + ["kernel"], sd[key].transpose(2, 3, 1, 0))

    def bn(path, key):
        _set(params, path + ["scale"], sd[key + ".weight"])
        _set(params, path + ["bias"], sd[key + ".bias"])
        _set(batch_stats, path + ["mean"], sd[key + ".running_mean"])
        _set(batch_stats, path + ["var"], sd[key + ".running_var"])

    for i in (1, 2, 3):
        conv(["visual", f"conv{i}"], f"visual.conv{i}.weight")
        bn(["visual", f"bn{i}"], f"visual.bn{i}")

    block_keys = sorted(
        {m.group(1) for k in sd for m in [re.match(r"visual\.(layer\d+\.\d+)\.", k)] if m}
    )
    for bk in block_keys:
        path = ["visual", bk]
        for j in (1, 2, 3):
            conv(path + [f"conv{j}"], f"visual.{bk}.conv{j}.weight")
            bn(path + [f"bn{j}"], f"visual.{bk}.bn{j}")
        if f"visual.{bk}.downsample.0.weight" in sd:
            conv(path + ["downsample.0"], f"visual.{bk}.downsample.0.weight")
            bn(path + ["downsample.1"], f"visual.{bk}.downsample.1")

    # attnpool: separate projections, (D|E, D) torch weights -> transposed kernels.
    ap = "visual.attnpool."
    _set(params, ["visual", "attnpool", "positional_embedding"], sd[ap + "positional_embedding"])
    for torch_name, flax_name in (
        ("q_proj", "query"),
        ("k_proj", "key"),
        ("v_proj", "value"),
        ("c_proj", "out"),
    ):
        _set(params, ["visual", "attnpool", flax_name, "kernel"], sd[ap + torch_name + ".weight"].T)
        _set(params, ["visual", "attnpool", flax_name, "bias"], sd[ap + torch_name + ".bias"])


def convert_torch_clip_vars(sd: Mapping[str, np.ndarray]):
    """Convert a torch CLIP state dict (numpy values) to flax variables."""
    sd = {k: np.asarray(v) for k, v in sd.items() if "num_batches_tracked" not in k}
    for meta in ("context_length", "input_resolution", "vocab_size"):
        sd.pop(meta, None)

    params: dict = {}
    batch_stats: dict = {}

    if "visual.conv1.weight" in sd and "visual.class_embedding" in sd:
        _convert_vit_visual(params, sd)
    else:
        _convert_resnet_visual(params, batch_stats, sd)

    # Text tower.
    _set(params, ["text", "token_embedding", "embedding"], sd["token_embedding.weight"])
    _set(params, ["text", "positional_embedding"], sd["positional_embedding"])
    _convert_transformer(params, ["text", "transformer"], "transformer.", sd)
    _set(params, ["text", "ln_final", "scale"], sd["ln_final.weight"])
    _set(params, ["text", "ln_final", "bias"], sd["ln_final.bias"])
    _set(params, ["text", "text_projection", "kernel"], sd["text_projection"])
    _set(params, ["logit_scale"], sd["logit_scale"])

    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return flax.core.freeze(variables)
