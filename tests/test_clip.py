"""CLIP parity: arp_tpu flax CLIP + converter vs an independent torch replica.

The torch model below reimplements OpenAI CLIP's forward pass (ViT tower +
text tower) with the original checkpoint parameter naming, generates a random
state dict, and the test checks that convert_torch_clip_vars + the flax model
reproduce its embeddings.  This validates exactly what matters for real
checkpoints: naming, transposition, attention layout, LN epsilon, quick_gelu,
EOT pooling.
"""

import math
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn

from arp_tpu.models.clip import CLIP, CONFIGS, convert_torch_clip_vars
from arp_tpu.models.clip.tokenizer import BPETokenizer, build_tokenizer, tokenize

TINY = dict(
    embed_dim=32,
    vocab_size=97,
    vision_num_layers=2,
    vision_features=48,
    vision_patch_size=8,
    text_features=32,
    text_num_heads=4,
    text_num_layers=2,
)
TINY_RN = dict(
    embed_dim=32,
    vocab_size=97,
    vision_num_layers=(1, 1, 1, 1),
    vision_features=8,
    text_features=32,
    text_num_heads=4,
    text_num_layers=2,
)


class TorchQuickGELU(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class TorchBlock(nn.Module):
    def __init__(self, d_model, n_head, attn_mask=None):
        super().__init__()
        self.attn = nn.MultiheadAttention(d_model, n_head)
        self.ln_1 = nn.LayerNorm(d_model)
        self.mlp = nn.Sequential(
            OrderedDict(
                [("c_fc", nn.Linear(d_model, d_model * 4)), ("gelu", TorchQuickGELU()), ("c_proj", nn.Linear(d_model * 4, d_model))]
            )
        )
        self.ln_2 = nn.LayerNorm(d_model)
        self.attn_mask = attn_mask

    def forward(self, x):
        mask = self.attn_mask.to(x.dtype) if self.attn_mask is not None else None
        x = x + self.attn(self.ln_1(x), self.ln_1(x), self.ln_1(x), need_weights=False, attn_mask=mask)[0]
        x = x + self.mlp(self.ln_2(x))
        return x


class TorchTransformer(nn.Module):
    def __init__(self, width, layers, heads, attn_mask=None):
        super().__init__()
        self.resblocks = nn.Sequential(*[TorchBlock(width, heads, attn_mask) for _ in range(layers)])

    def forward(self, x):
        return self.resblocks(x)


class TorchVisionTransformer(nn.Module):
    def __init__(self, input_resolution, patch_size, width, layers, heads, output_dim):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width, patch_size, patch_size, bias=False)
        scale = width**-0.5
        self.class_embedding = nn.Parameter(scale * torch.randn(width))
        self.positional_embedding = nn.Parameter(scale * torch.randn((input_resolution // patch_size) ** 2 + 1, width))
        self.ln_pre = nn.LayerNorm(width)
        self.transformer = TorchTransformer(width, layers, heads)
        self.ln_post = nn.LayerNorm(width)
        self.proj = nn.Parameter(scale * torch.randn(width, output_dim))

    def forward(self, x):
        x = self.conv1(x)
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
        cls = self.class_embedding.to(x.dtype) + torch.zeros(x.shape[0], 1, x.shape[-1], dtype=x.dtype)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding.to(x.dtype)
        x = self.ln_pre(x)
        x = self.transformer(x.permute(1, 0, 2)).permute(1, 0, 2)
        x = self.ln_post(x[:, 0, :])
        return x @ self.proj


class TorchCLIP(nn.Module):
    """OpenAI-naming torch CLIP (ViT tower)."""

    def __init__(self, cfg, context_length=77, input_resolution=64):
        super().__init__()
        self.context_length = context_length
        self.visual = TorchVisionTransformer(
            input_resolution, cfg["vision_patch_size"], cfg["vision_features"], cfg["vision_num_layers"],
            cfg["vision_features"] // 64 or 4, cfg["embed_dim"],
        )
        mask = torch.full((context_length, context_length), float("-inf")).triu_(1)
        self.transformer = TorchTransformer(cfg["text_features"], cfg["text_num_layers"], cfg["text_num_heads"], mask)
        self.token_embedding = nn.Embedding(cfg["vocab_size"], cfg["text_features"])
        self.positional_embedding = nn.Parameter(torch.randn(context_length, cfg["text_features"]) * 0.01)
        self.ln_final = nn.LayerNorm(cfg["text_features"])
        self.text_projection = nn.Parameter(torch.randn(cfg["text_features"], cfg["embed_dim"]) * 0.02)
        self.logit_scale = nn.Parameter(torch.ones([]) * math.log(1 / 0.07))

    def encode_image(self, image):
        return self.visual(image)

    def encode_text(self, text):
        x = self.token_embedding(text) + self.positional_embedding
        x = self.transformer(x.permute(1, 0, 2)).permute(1, 0, 2)
        x = self.ln_final(x)
        x = x[torch.arange(x.shape[0]), text.argmax(dim=-1)]
        return x @ self.text_projection


def _tiny_vit_heads_fix():
    # flax CLIP derives vision heads as features // 64; with features=48 that
    # is 0 — use features=64 instead to keep head math valid.
    cfg = dict(TINY)
    cfg["vision_features"] = 64
    return cfg


@pytest.fixture(scope="module")
def torch_and_flax():
    torch.manual_seed(0)
    cfg = _tiny_vit_heads_fix()
    tmodel = TorchCLIP(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_torch_clip_vars(sd)
    fmodel = CLIP(**cfg)
    return cfg, tmodel, fmodel, variables


def test_vit_image_parity(torch_and_flax):
    cfg, tmodel, fmodel, variables = torch_and_flax
    rng = np.random.default_rng(0)
    img = rng.normal(size=(3, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        expected = tmodel.encode_image(torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
    got = fmodel.apply(variables, jnp.asarray(img), normalize=False, method=fmodel.encode_image)
    # 2e-5: tight enough to catch an LN-epsilon regression to flax's
    # default 1e-6 (measured drift ~1e-4; correct-eps agreement ~5e-7)
    np.testing.assert_allclose(np.asarray(got), expected, atol=2e-5)


def test_text_parity(torch_and_flax):
    cfg, tmodel, fmodel, variables = torch_and_flax
    rng = np.random.default_rng(1)
    text = np.zeros((4, 77), np.int64)
    for i in range(4):
        n = rng.integers(3, 20)
        text[i, 0] = 90  # SOT-ish
        text[i, 1 : n - 1] = rng.integers(1, 89, size=n - 2)
        text[i, n - 1] = cfg["vocab_size"] - 1  # EOT = highest id
    with torch.no_grad():
        expected = tmodel.encode_text(torch.from_numpy(text)).numpy()
    got = fmodel.apply(variables, jnp.asarray(text.astype(np.int32)), normalize=False, method=fmodel.encode_text)
    # 2e-5: tight enough to catch an LN-epsilon regression to flax's
    # default 1e-6 (measured drift ~1e-4; correct-eps agreement ~5e-7)
    np.testing.assert_allclose(np.asarray(got), expected, atol=2e-5)


def test_full_clip_logits(torch_and_flax):
    cfg, tmodel, fmodel, variables = torch_and_flax
    rng = np.random.default_rng(2)
    img = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    text = np.zeros((2, 77), np.int64)
    text[:, 0] = 90
    text[:, 1] = 5
    text[:, 2] = cfg["vocab_size"] - 1
    with torch.no_grad():
        ie = tmodel.encode_image(torch.from_numpy(img.transpose(0, 3, 1, 2)))
        te = tmodel.encode_text(torch.from_numpy(text))
        ie = ie / ie.norm(dim=-1, keepdim=True)
        te = te / te.norm(dim=-1, keepdim=True)
        expected = (tmodel.logit_scale.exp() * ie @ te.t()).numpy()
    gi, gt = fmodel.apply(variables, jnp.asarray(img), jnp.asarray(text.astype(np.int32)))
    scale = jnp.exp(variables["params"]["logit_scale"])
    got = np.asarray(scale * gi @ gt.T)
    np.testing.assert_allclose(got, expected, atol=2e-3)


def test_resnet_clip_forward_shape():
    """RN tower: init + forward shapes (weight-level parity covered for ViT)."""
    model = CLIP(**TINY_RN)
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    text = jnp.asarray(np.array([[90, 5, 96] + [0] * 74] * 2, np.int32))
    variables = model.init(jax.random.PRNGKey(0), img, text)
    ie, te = model.apply(variables, img, text)
    assert ie.shape == (2, TINY_RN["embed_dim"])
    assert te.shape == (2, TINY_RN["embed_dim"])
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(ie, axis=-1)), 1.0, atol=1e-5)


def test_tokenizer_roundtrip_and_framing():
    tok = BPETokenizer()  # byte-level fallback vocab
    ids = tok.encode("collect the coin.")
    assert ids, "must produce tokens"
    # decode joins word-final </w> with spaces (same as OpenAI's decoder),
    # so punctuation comes back space-separated.
    assert tok.decode(ids).strip() == "collect the coin ."
    arr = tokenize(["collect the coin."], tok)
    assert arr.shape == (1, 77)
    assert arr[0, 0] == tok.sot_token
    eot_pos = int(np.argmax(arr[0]))
    assert arr[0, eot_pos] == tok.eot_token
    assert (arr[0, eot_pos + 1 :] == 0).all()


def test_tokenizer_bpe_merges(tmp_path):
    """With a merges file, BPE merging applies in rank order."""
    merges = "version-comment\nt h\nth e</w>\n"
    path = tmp_path / "merges.txt"
    path.write_text(merges)
    tok = BPETokenizer(str(path))
    ids = tok.encode("the")
    toks = [tok.decoder[i] for i in ids]
    assert toks == ["the</w>"]


def test_build_tokenizer_callable():
    fn = build_tokenizer()
    out = fn(["navigate a maze."])
    assert out.shape == (1, 77)


def test_tokenizer_fallback_warns(tmp_path):
    import warnings as _warnings

    from arp_tpu.models.clip.tokenizer import build_tokenizer

    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        fn = build_tokenizer(bpe_path=str(tmp_path / "missing.txt"))
    assert fn.tokenizer.using_fallback_vocab
    assert any("FALLBACK" in str(w.message) for w in caught)

    merges = tmp_path / "merges.txt"
    merges.write_text("#version\n" + "a b\n")
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        fn = build_tokenizer(bpe_path=str(merges))
    assert not fn.tokenizer.using_fallback_vocab
    assert not any("FALLBACK" in str(w.message) for w in caught)
