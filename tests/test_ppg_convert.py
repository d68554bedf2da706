"""Reference PPG expert (.jd) ingestion: stub-unpickling + weight conversion.

Builds an independent torch replica of the reference's PhasicValueModel
(ImpalaEncoder with NormedConv2d-equivalent convs, dual value heads,
data/PPG/phasic_policy_gradient/{ppg,impala_cnn}.py), pickles it the way the
reference ships experts (torch.save of the full model object, classes under
``phasic_policy_gradient.*``), deletes those modules, and verifies the
loader still extracts the weights and that the converted JAX model's
logits/values match the torch forward.
"""

import math
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn

from arp_tpu.collect.convert_ppg import (
    convert_torch_ppg_state_dict,
    load_reference_ppg_expert,
    load_torch_ppg_state_dict,
)
from arp_tpu.collect.ppg import PhasicValueModel

FAKE_PKG = "phasic_policy_gradient"


class TorchBasicBlock(nn.Module):
    def __init__(self, chan):
        super().__init__()
        self.conv0 = nn.Conv2d(chan, chan, 3, padding=1)
        self.conv1 = nn.Conv2d(chan, chan, 3, padding=1)

    def forward(self, x):
        y = self.conv0(F.relu(x))
        y = self.conv1(F.relu(y))
        return x + y


class TorchDownStack(nn.Module):
    def __init__(self, inchan, outchan, nblock):
        super().__init__()
        self.firstconv = nn.Conv2d(inchan, outchan, 3, padding=1)
        self.blocks = nn.ModuleList([TorchBasicBlock(outchan) for _ in range(nblock)])

    def forward(self, x):
        x = self.firstconv(x)
        x = F.max_pool2d(x, kernel_size=3, stride=2, padding=1)
        for b in self.blocks:
            x = b(x)
        return x


class TorchImpalaCNN(nn.Module):
    def __init__(self, inshape=(64, 64, 3), chans=(16, 32, 32), outsize=256, nblock=2):
        super().__init__()
        h, w, c = inshape
        self.stacks = nn.ModuleList()
        cur = c
        for ch in chans:
            self.stacks.append(TorchDownStack(cur, ch, nblock))
            cur = ch
            h, w = (h + 1) // 2, (w + 1) // 2
        self.dense = nn.Linear(cur * h * w, outsize)

    def forward(self, x):  # x: (B, H, W, C) in [0, 1]
        x = x.permute(0, 3, 1, 2)
        for s in self.stacks:
            x = s(x)
        x = torch.relu(x.reshape(x.shape[0], -1))  # flattens (C, H, W) order
        return torch.relu(self.dense(x))


class TorchEncoderShell(nn.Module):
    """Mimics ImpalaEncoder's `cnn` nesting (impala_cnn.py:158)."""

    def __init__(self, **kw):
        super().__init__()
        self.cnn = TorchImpalaCNN(**kw)

    def forward(self, x):
        return self.cnn(x)


class TorchPhasicValueModel(nn.Module):
    def __init__(self, num_actions=15):
        super().__init__()
        self.pi_enc = TorchEncoderShell()
        self.vf_enc = TorchEncoderShell()
        self.pi_head = nn.Linear(256, num_actions)
        self.vf_vhead = nn.Linear(256, 1)
        self.aux_vf_head = nn.Linear(256, 1)

    def forward(self, obs):
        pi_x = self.pi_enc(obs)
        logits = self.pi_head(pi_x)
        aux = self.aux_vf_head(pi_x)[..., 0]
        value = self.vf_vhead(self.vf_enc(obs))[..., 0]
        return logits, value, aux


def _fake_package_save(tmp_path, model):
    """torch.save the model with its classes registered under the reference's
    package name, then remove that package — exactly the situation when a
    shipped .jd is loaded without the reference installed."""
    mod = types.ModuleType(FAKE_PKG)
    classes = [
        TorchBasicBlock, TorchDownStack, TorchImpalaCNN, TorchEncoderShell, TorchPhasicValueModel,
    ]
    for cls in classes:
        cls.__module__ = FAKE_PKG
        setattr(mod, cls.__name__, cls)
    sys.modules[FAKE_PKG] = mod
    path = tmp_path / "model1000_IC100007936.jd"
    try:
        torch.save(model, str(path))
    finally:
        del sys.modules[FAKE_PKG]
        for cls in classes:
            cls.__module__ = __name__
    return str(path)


def test_jd_roundtrip_and_forward_parity(tmp_path):
    torch.manual_seed(0)
    tmodel = TorchPhasicValueModel().eval()
    path = _fake_package_save(tmp_path, tmodel)

    assert FAKE_PKG not in sys.modules
    model, variables = load_reference_ppg_expert(path)
    assert model.pool_padding == "torch" and model.arch == "dual"

    rng = np.random.default_rng(0)
    obs = rng.random((4, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want_logits, want_value, want_aux = tmodel(torch.from_numpy(obs))
    got_logits, got_value, got_aux = model.apply(variables, jnp.asarray(obs))
    np.testing.assert_allclose(np.asarray(got_logits), want_logits.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_value), want_value.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_aux), want_aux.numpy(), atol=2e-4)


def test_state_dict_structure_matches_init():
    torch.manual_seed(1)
    tmodel = TorchPhasicValueModel()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = convert_torch_ppg_state_dict(sd)
    model = PhasicValueModel(pool_padding="torch")
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]

    def shapes(tree):
        return {
            "/".join(str(getattr(p, "key", p)) for p in path): np.shape(leaf)
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    assert shapes(params) == shapes(init)


def test_plain_state_dict_file(tmp_path):
    """.jd files holding a bare state dict also load."""
    torch.manual_seed(2)
    tmodel = TorchPhasicValueModel()
    path = tmp_path / "sd.jd"
    torch.save(tmodel.state_dict(), str(path))
    sd = load_torch_ppg_state_dict(str(path))
    assert "pi_enc.cnn.stacks.0.firstconv.weight" in sd
    assert sd["pi_head.weight"].shape == (15, 256)
