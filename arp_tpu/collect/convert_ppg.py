"""Ingest reference PPG expert checkpoints (torch ``.jd`` files).

The reference collects demos with shipped torch PPG experts loaded via
``torch.load(model_path)`` (data/PPG/collect_procgen_data.py:31) — full
pickled ``PhasicValueModel`` objects whose classes live in the reference's
``phasic_policy_gradient`` package.  Two pieces make them loadable here:

  * :func:`load_torch_ppg_state_dict` — unpickles a ``.jd`` WITHOUT the
    reference package installed, by resolving any missing class to a stub
    ``nn.Module`` subclass (pickle restores module state through the
    instance ``__dict__``, so ``state_dict()`` still walks the real
    parameter tree);
  * :func:`convert_torch_ppg_state_dict` — maps that state dict onto this
    framework's :class:`~arp_tpu.collect.ppg.PhasicValueModel` param tree
    (conv OIHW->HWIO, the dense kernel's CHW->HWC flatten-order permutation,
    the ``{key}_vhead`` head naming).

Converted experts drive :mod:`arp_tpu.collect.recorder` demo collection;
inputs are [0,1]-scaled frames (the torch model divides by 255 internally —
same numbers).
"""

from __future__ import annotations

import pickle
from typing import Mapping

import numpy as np


def load_torch_ppg_state_dict(path: str) -> dict:
    """Extract a numpy state dict from a reference ``.jd`` torch pickle.

    Works whether the file holds a full pickled model (the reference's
    format) or a plain state dict, and does not require the reference's
    ``phasic_policy_gradient`` (or gym3) packages: unknown classes resolve
    to minimal stubs.
    """
    import torch
    from torch import nn

    class _StubModule(nn.Module):
        def __init__(self, *args, **kwargs):
            super().__init__()

    class _StubObject:
        def __init__(self, *args, **kwargs):
            pass

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                # torch modules need the nn.Module machinery to restore their
                # parameter/buffer dicts; anything else just needs a shell
                if "gym3" in module or name.endswith("Type") or name in ("REAL", "DISCRETE"):
                    return _StubObject
                return type(name, (_StubModule,), {})

    def _load(file):
        return torch.load(
            file, map_location="cpu", weights_only=False, pickle_module=_PickleShim
        )

    class _PickleShim:
        Unpickler = _Unpickler
        load = staticmethod(lambda f, **kw: _Unpickler(f).load())

    with open(path, "rb") as f:
        obj = _load(f)
    if hasattr(obj, "state_dict"):
        sd = obj.state_dict()
    elif isinstance(obj, Mapping):
        sd = obj
    else:
        raise ValueError(f"unsupported checkpoint object {type(obj)!r}")
    return {k: np.asarray(v.detach().cpu() if hasattr(v, "detach") else v) for k, v in sd.items()}


def _conv(sd, key):
    # torch OIHW -> flax HWIO
    return {
        "kernel": np.transpose(sd[f"{key}.weight"], (2, 3, 1, 0)),
        "bias": sd[f"{key}.bias"],
    }


def _dense(sd, key):
    return {"kernel": np.transpose(sd[f"{key}.weight"]), "bias": sd[f"{key}.bias"]}


def _dense_from_chw(sd, key, chw):
    """Dense over a flattened feature map: torch flattens (C,H,W), flax (H,W,C)."""
    c, h, w = chw
    weight = sd[f"{key}.weight"]  # (out, C*H*W)
    weight = weight.reshape(weight.shape[0], c, h, w).transpose(0, 2, 3, 1)
    weight = weight.reshape(weight.shape[0], h * w * c)
    return {"kernel": np.transpose(weight), "bias": sd[f"{key}.bias"]}


def _convert_impala(sd, prefix, inshape, chans=(16, 32, 32), nblock=2):
    out = {}
    h, w, _ = inshape
    for s, ch in enumerate(chans):
        out[f"stack{s}_firstconv"] = _conv(sd, f"{prefix}.stacks.{s}.firstconv")
        h, w = (h + 1) // 2, (w + 1) // 2
        for b in range(nblock):
            out[f"stack{s}_block{b}_conv0"] = _conv(sd, f"{prefix}.stacks.{s}.blocks.{b}.conv0")
            out[f"stack{s}_block{b}_conv1"] = _conv(sd, f"{prefix}.stacks.{s}.blocks.{b}.conv1")
    out["dense"] = _dense_from_chw(sd, f"{prefix}.dense", (chans[-1], h, w))
    return out


def convert_torch_ppg_state_dict(
    sd: Mapping[str, np.ndarray],
    inshape=(64, 64, 3),
    arch: str = "dual",
    chans=(16, 32, 32),
    nblock: int = 2,
) -> dict:
    """Torch PhasicValueModel state dict -> arp_tpu PhasicValueModel params."""
    params = {
        "pi_enc": _convert_impala(sd, "pi_enc.cnn", inshape, chans, nblock),
        "pi_head": _dense(sd, "pi_head"),
        "aux_vf_head": _dense(sd, "aux_vf_head"),
    }
    if arch == "dual":
        params["vf_enc"] = _convert_impala(sd, "vf_enc.cnn", inshape, chans, nblock)
        params["vf_head"] = _dense(sd, "vf_vhead")
    else:  # shared / detach store their value head under the pi key
        params["vf_head"] = _dense(sd, "pi_vhead")
    return params


def load_reference_ppg_expert(path: str, num_actions: int = 15, inshape=(64, 64, 3), arch: str = "dual"):
    """One-call loader: ``.jd`` file -> (model, params) ready for rollout.

    The returned model uses torch-compatible pooling alignment so converted
    experts act identically (see ImpalaCNN.pool_padding).
    """
    from .ppg import PhasicValueModel

    sd = load_torch_ppg_state_dict(path)
    arch_found = "dual" if any(k.startswith("vf_enc.") for k in sd) else arch
    params = convert_torch_ppg_state_dict(sd, inshape=inshape, arch=arch_found)
    model = PhasicValueModel(num_actions=num_actions, arch=arch_found, pool_padding="torch")
    return model, {"params": params}
