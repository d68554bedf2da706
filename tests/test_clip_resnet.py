"""ModifiedResNet CLIP tower parity vs an independent torch replica.

Covers the RN-specific conversion paths: conv/bn stems, bottleneck blocks
with anti-aliased downsampling, and the attention-pool head with separate
q/k/v/c projections (reference converter handled these at
openai/model.py:286-302; ours maps them in convert._convert_resnet_visual).
"""

import math
from collections import OrderedDict

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn

from arp_tpu.models.clip import CLIP
from arp_tpu.models.clip.convert import convert_torch_clip_vars
from tests.test_clip import TorchTransformer

CFG = dict(
    embed_dim=32,
    vocab_size=97,
    vision_num_layers=(1, 1, 1, 1),
    vision_features=8,
    text_features=32,
    text_num_heads=4,
    text_num_layers=2,
)


class TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.avgpool = nn.AvgPool2d(stride) if stride > 1 else nn.Identity()
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        self.stride = stride
        if stride > 1 or inplanes != planes * 4:
            self.downsample = nn.Sequential(
                OrderedDict(
                    [
                        ("-1", nn.AvgPool2d(stride)),
                        ("0", nn.Conv2d(inplanes, planes * 4, 1, stride=1, bias=False)),
                        ("1", nn.BatchNorm2d(planes * 4)),
                    ]
                )
            )

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchAttentionPool2d(nn.Module):
    def __init__(self, spacial_dim, embed_dim, num_heads, output_dim):
        super().__init__()
        self.positional_embedding = nn.Parameter(
            torch.randn(spacial_dim**2 + 1, embed_dim) / embed_dim**0.5
        )
        self.k_proj = nn.Linear(embed_dim, embed_dim)
        self.q_proj = nn.Linear(embed_dim, embed_dim)
        self.v_proj = nn.Linear(embed_dim, embed_dim)
        self.c_proj = nn.Linear(embed_dim, output_dim)
        self.num_heads = num_heads

    def forward(self, x):
        b, c, h, w = x.shape
        x = x.reshape(b, c, h * w).permute(2, 0, 1)  # (HW, B, C)
        x = torch.cat([x.mean(dim=0, keepdim=True), x], dim=0)
        x = x + self.positional_embedding[:, None, :]
        n = x.shape[0]
        q = self.q_proj(x[:1])
        k = self.k_proj(x)
        v = self.v_proj(x)
        hd = c // self.num_heads
        q = q.reshape(1, b, self.num_heads, hd).permute(1, 2, 0, 3)
        k = k.reshape(n, b, self.num_heads, hd).permute(1, 2, 0, 3)
        v = v.reshape(n, b, self.num_heads, hd).permute(1, 2, 0, 3)
        attn = torch.softmax(q @ k.transpose(-2, -1) / math.sqrt(hd), dim=-1)
        out = (attn @ v).permute(2, 0, 1, 3).reshape(1, b, c)
        return self.c_proj(out)[0]


class TorchModifiedResNet(nn.Module):
    def __init__(self, layers, output_dim, heads, input_resolution=64, width=8):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width // 2, 3, stride=2, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(width // 2)
        self.conv2 = nn.Conv2d(width // 2, width // 2, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(width // 2)
        self.conv3 = nn.Conv2d(width // 2, width, 3, padding=1, bias=False)
        self.bn3 = nn.BatchNorm2d(width)
        self.avgpool = nn.AvgPool2d(2)
        self.relu = nn.ReLU(inplace=True)
        self._inplanes = width
        self.layer1 = self._make_layer(width, layers[0])
        self.layer2 = self._make_layer(width * 2, layers[1], stride=2)
        self.layer3 = self._make_layer(width * 4, layers[2], stride=2)
        self.layer4 = self._make_layer(width * 8, layers[3], stride=2)
        spacial = input_resolution // 32
        self.attnpool = TorchAttentionPool2d(spacial, width * 32, heads, output_dim)

    def _make_layer(self, planes, blocks, stride=1):
        layers = [TorchBottleneck(self._inplanes, planes, stride)]
        self._inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(TorchBottleneck(self._inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.relu(self.bn2(self.conv2(x)))
        x = self.relu(self.bn3(self.conv3(x)))
        x = self.avgpool(x)
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        return self.attnpool(x)


def test_resnet_tower_parity():
    torch.manual_seed(0)
    width = CFG["vision_features"]
    heads = width * 32 // 64
    tmodel = TorchModifiedResNet(
        layers=CFG["vision_num_layers"], output_dim=CFG["embed_dim"], heads=heads,
        input_resolution=64, width=width,
    ).eval()
    # randomize batchnorm running stats so the conversion is actually exercised
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    sd = {("visual." + k): v.detach().numpy() for k, v in tmodel.state_dict().items()}
    # strip the avgpool Identity keys and fix downsample naming: torch saves
    # 'downsample.-1' for the avgpool (no params) so nothing to map there.
    sd = {k.replace(".downsample.-1", ".downsample_pool"): v for k, v in sd.items()}
    sd = {k: v for k, v in sd.items() if "downsample_pool" not in k}

    # add a minimal text tower so convert_torch_clip_vars sees a full model
    ttext = TorchTransformer(CFG["text_features"], CFG["text_num_layers"], CFG["text_num_heads"])
    for k, v in ttext.state_dict().items():
        sd["transformer." + k] = v.detach().numpy()
    sd["token_embedding.weight"] = np.random.default_rng(0).normal(size=(97, 32)).astype(np.float32)
    sd["positional_embedding"] = np.zeros((77, 32), np.float32)
    sd["ln_final.weight"] = np.ones(32, np.float32)
    sd["ln_final.bias"] = np.zeros(32, np.float32)
    sd["text_projection"] = np.eye(32, dtype=np.float32)
    sd["logit_scale"] = np.float32(0.0)

    variables = convert_torch_clip_vars(sd)
    fmodel = CLIP(**CFG)

    rng = np.random.default_rng(1)
    img = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        expected = tmodel(torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
    got = fmodel.apply(variables, jnp.asarray(img), normalize=False, method=fmodel.encode_image)
    np.testing.assert_allclose(np.asarray(got), expected, atol=5e-4)
