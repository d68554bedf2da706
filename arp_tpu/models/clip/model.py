"""CLIP in Flax, built on the shared fused-attention transformer stack.

A from-scratch TPU-native implementation of OpenAI CLIP covering the same
model zoo as the reference (arp_dt/models/openai/model.py:59-135): ViT-B/32,
ViT-B/16, ViT-L/14 and ModifiedResNet 50/101/50x4/50x16/50x64.  Weights load
from the original OpenAI torch checkpoints via
:func:`arp_tpu.models.clip.convert.convert_torch_clip_vars`.

TPU-first differences from the reference port:
  * attention goes through arp_tpu.ops.attention (Pallas flash kernel on TPU,
    fused XLA otherwise) with lazy causal / key-padding masks — the reference
    materializes (77, 77) masks per call (openai/layers.py:363);
  * patch embedding is an einops reshape + Dense (one big MXU matmul) rather
    than a conv lowering;
  * bf16 encode is caller-side: cast the variables and inputs to bfloat16
    (the model is dtype-polymorphic) — see ClipRewardEngine's ``_cast``
    (reward/engine.py) and the policy's frozen-CLIP path; reward-MAE tests
    bound the accuracy impact.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import dot_product_attention
from ...ops.masks import MaskSpec

# Match PyTorch LayerNorm epsilon (flax defaults to 1e-6).
LayerNorm = functools.partial(nn.LayerNorm, epsilon=1e-5)

MAX_TEXT_LENGTH = 77
IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073])
IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711])

IMAGE_RESOLUTION = {
    "resnet_50": 224,
    "resnet_101": 224,
    "resnet_50x4": 288,
    "resnet_50x16": 384,
    "resnet_50x64": 448,
    "vit_b32": 224,
    "vit_b16": 224,
    "vit_l14": 224,
    "vit_b32_clip4clip": 224,
    "vit_b16_clip4clip": 224,
}

# Same architecture table as openai/model.py:59-135.
CONFIGS = {
    "vit_b32": dict(embed_dim=512, vocab_size=49408, vision_num_layers=12, vision_features=768,
                    vision_patch_size=32, text_features=512, text_num_heads=8, text_num_layers=12),
    "vit_b16": dict(embed_dim=512, vocab_size=49408, vision_num_layers=12, vision_features=768,
                    vision_patch_size=16, text_features=512, text_num_heads=8, text_num_layers=12),
    "vit_l14": dict(embed_dim=768, vocab_size=49408, vision_num_layers=24, vision_features=1024,
                    vision_patch_size=14, text_features=768, text_num_heads=12, text_num_layers=12),
    "resnet_50": dict(embed_dim=1024, vocab_size=49408, vision_num_layers=(3, 4, 6, 3), vision_features=64,
                      text_features=512, text_num_heads=8, text_num_layers=12),
    "resnet_101": dict(embed_dim=512, vocab_size=49408, vision_num_layers=(3, 4, 23, 3), vision_features=64,
                       text_features=512, text_num_heads=8, text_num_layers=12),
    "resnet_50x4": dict(embed_dim=640, vocab_size=49408, vision_num_layers=(4, 6, 10, 6), vision_features=80,
                        text_features=640, text_num_heads=10, text_num_layers=12),
    "resnet_50x16": dict(embed_dim=768, vocab_size=49408, vision_num_layers=(6, 8, 18, 8), vision_features=96,
                         text_features=768, text_num_heads=12, text_num_layers=12),
    "resnet_50x64": dict(embed_dim=1024, vocab_size=49408, vision_num_layers=(3, 15, 36, 10), vision_features=128,
                         text_features=1024, text_num_heads=16, text_num_layers=12),
}


def normalize_image(img: jnp.ndarray) -> jnp.ndarray:
    return (img - IMAGE_MEAN) / IMAGE_STD


def unnormalize_image(x: jnp.ndarray) -> jnp.ndarray:
    return x * IMAGE_STD + IMAGE_MEAN


class QuickGELU(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x * nn.sigmoid(1.702 * x)


class CLIPMLP(nn.Module):
    """Transformer MLP with CLIP naming (c_fc / c_proj) and quick_gelu."""

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        x = nn.Dense(4 * ch, name="c_fc")(x)
        x = x * nn.sigmoid(1.702 * x)
        return nn.Dense(ch, name="c_proj")(x)


class CLIPAttention(nn.Module):
    """Self-attention with separate q/k/v/out Dense (torch-checkpoint layout)."""

    num_heads: int
    # dtype of the (B, H, N, N) score tensor + softmax (None = fp32).  bf16
    # halves the score HBM traffic; measured +6.7% on the v5e resident encode
    # (docs/BENCHMARKS.md) — chip-dependent, only for frozen/inference use.
    score_dtype: Any = None

    @nn.compact
    def __call__(self, x, mask_spec=MaskSpec("none"), kv_padding=None):
        b, n, d = x.shape
        head_dim = d // self.num_heads
        q = nn.Dense(d, name="query")(x)
        k = nn.Dense(d, name="key")(x)
        v = nn.Dense(d, name="value")(x)
        split = lambda t: t.reshape(b, n, self.num_heads, head_dim)
        out = dot_product_attention(
            split(q), split(k), split(v), spec=mask_spec, kv_padding=kv_padding,
            score_dtype=self.score_dtype or jnp.float32,
        )
        out = out.reshape(b, n, d)
        return nn.Dense(d, name="out")(out)


class ResidualAttentionBlock(nn.Module):
    num_heads: int
    score_dtype: Any = None

    @nn.compact
    def __call__(self, x, mask_spec=MaskSpec("none"), kv_padding=None):
        y = LayerNorm(name="ln_1")(x)
        x = x + CLIPAttention(self.num_heads, score_dtype=self.score_dtype, name="attn")(
            y, mask_spec, kv_padding
        )
        y = LayerNorm(name="ln_2")(x)
        return x + CLIPMLP(name="mlp")(y)


class CLIPTransformer(nn.Module):
    features: int
    num_layers: int
    num_heads: int
    score_dtype: Any = None

    @nn.compact
    def __call__(self, x, mask_spec=MaskSpec("none"), kv_padding=None):
        for i in range(self.num_layers):
            x = ResidualAttentionBlock(
                self.num_heads, score_dtype=self.score_dtype, name=f"resblocks.{i}"
            )(x, mask_spec, kv_padding)
            self.sow("intermediates", f"intermediate_layer_{i}", x)
        return x


class VisionTransformer(nn.Module):
    patch_size: int
    features: int
    num_layers: int
    num_heads: int
    out_features: Optional[int]
    score_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        # Accepts images (B, H, W, C) or pre-patchified vectors (B, N, P*P*C)
        # in (p_row, p_col, channel) order (see ops/preprocess.py packed path).
        p = self.patch_size
        if x.ndim == 4:
            b, h, w, c = x.shape
            # Patchify as reshape + Dense: one (B*N, P*P*C) x (P*P*C, F)
            # matmul on the MXU.  Equivalent to the reference conv (kernel
            # converted accordingly in convert.py).
            x = x.reshape(b, h // p, p, w // p, p, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (h // p) * (w // p), p * p * c)
        else:
            b = x.shape[0]
        x = nn.Dense(self.features, use_bias=False, name="conv1")(x)

        scale = 1.0 / jnp.sqrt(self.features)
        class_embedding = self.param(
            "class_embedding", jax.nn.initializers.normal(stddev=scale), (self.features,)
        )
        x = jnp.concatenate(
            (jnp.tile(class_embedding[None, None, :], (b, 1, 1)), x), axis=1
        )
        positional_embedding = self.param(
            "positional_embedding", jax.nn.initializers.normal(stddev=scale), (x.shape[1], self.features)
        )
        x = x + positional_embedding[None, : x.shape[1]]
        x = LayerNorm(name="ln_pre")(x)
        x = feature_map = CLIPTransformer(
            self.features, self.num_layers, self.num_heads,
            score_dtype=self.score_dtype, name="transformer"
        )(x)
        if self.out_features is not None:
            x = LayerNorm(name="ln_post")(x[:, 0])
            x = nn.Dense(self.out_features, use_bias=False, name="proj")(x)
        else:
            x = LayerNorm(name="ln_post")(x)
        return x, feature_map


# --- ModifiedResNet ----------------------------------------------------------


class Bottleneck(nn.Module):
    features: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        out = nn.relu(nn.BatchNorm(use_running_average=True, name="bn1")(
            nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)))
        out = nn.relu(nn.BatchNorm(use_running_average=True, name="bn2")(
            nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, name="conv2")(out)))
        out = nn.avg_pool(out, (self.stride, self.stride), (self.stride, self.stride))
        out = nn.BatchNorm(use_running_average=True, name="bn3")(
            nn.Conv(self.features * self.expansion, (1, 1), use_bias=False, name="conv3")(out))

        if self.stride > 1 or x.shape[-1] != self.features * self.expansion:
            x = nn.avg_pool(x, (self.stride, self.stride), (self.stride, self.stride))
            x = nn.Conv(self.features * self.expansion, (1, 1), use_bias=False, name="downsample.0")(x)
            x = nn.BatchNorm(use_running_average=True, name="downsample.1")(x)
        return nn.relu(out + x)


class AttentionPool(nn.Module):
    num_heads: int
    out_features: int

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        d = x.shape[-1]
        x = x.reshape(b, -1, d)
        x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)
        positional_embedding = self.param(
            "positional_embedding",
            jax.nn.initializers.normal(1.0 / d**0.5),
            (x.shape[1], d),
        )
        x = x + positional_embedding[None, : x.shape[1]]
        head_dim = d // self.num_heads
        q = nn.Dense(d, name="query")(x[:, :1])
        k = nn.Dense(d, name="key")(x)
        v = nn.Dense(d, name="value")(x)
        q = q.reshape(b, 1, self.num_heads, head_dim)
        k = k.reshape(b, -1, self.num_heads, head_dim)
        v = v.reshape(b, -1, self.num_heads, head_dim)
        # cross-attention (1 query): do it directly, no mask needed
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(head_dim).astype(q.dtype)
        p = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, 1, d)
        return nn.Dense(self.out_features, name="out")(out)[:, 0]


class ModifiedResNet(nn.Module):
    features: int
    out_features: Optional[int]
    num_layers: Sequence[int]
    num_heads: Optional[int]

    @nn.compact
    def __call__(self, x):
        # 3-conv stem with avg-pool (anti-aliased downsampling).
        for i, (feat, stride) in enumerate(
            [(self.features // 2, 2), (self.features // 2, 1), (self.features, 1)], start=1
        ):
            x = nn.Conv(feat, (3, 3), strides=(stride, stride), padding=[(1, 1), (1, 1)],
                        use_bias=False, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=True, name=f"bn{i}")(x)
            x = nn.relu(x)
        x = nn.avg_pool(x, (2, 2), (2, 2))

        for stage, (n_blocks, stride) in enumerate(
            zip(self.num_layers, (1, 2, 2, 2)), start=1
        ):
            feats = self.features * (2 ** (stage - 1))
            x = Bottleneck(feats, stride, name=f"layer{stage}.0")(x)
            for j in range(1, n_blocks):
                x = Bottleneck(feats, name=f"layer{stage}.{j}")(x)

        feature_map = x
        if self.out_features is not None:
            x = AttentionPool(self.num_heads, self.out_features, name="attnpool")(x)
        return x, feature_map


class TextEncoder(nn.Module):
    vocab_size: int
    features: int
    num_layers: int
    num_heads: int
    out_features: int
    score_dtype: Any = None

    @nn.compact
    def __call__(self, text):
        positional_embedding = self.param(
            "positional_embedding", jax.nn.initializers.zeros, (text.shape[1], self.features)
        )
        x = nn.Embed(self.vocab_size, self.features, name="token_embedding")(text)
        x = x + positional_embedding[None]
        # causal + key-padding (pad id 0), both lazy.
        x = CLIPTransformer(
            self.features, self.num_layers, self.num_heads,
            score_dtype=self.score_dtype, name="transformer"
        )(x, mask_spec=MaskSpec("causal"), kv_padding=(text == 0).astype(jnp.int32))
        x = LayerNorm(name="ln_final")(x)
        # EOT token (highest id) pools the sequence.
        x = x[jnp.arange(x.shape[0]), text.argmax(-1)]
        return nn.Dense(self.out_features, use_bias=False, name="text_projection")(x)


class CLIP(nn.Module):
    """CLIP with `encode_image` / `encode_text` (L2-normalized by default)."""

    vocab_size: int
    embed_dim: int
    text_features: int
    text_num_layers: int
    text_num_heads: int
    vision_features: int
    vision_num_layers: Union[int, Sequence[int]]
    vision_patch_size: Optional[int] = None
    vision_return_map: bool = False
    # attention score/softmax dtype for both towers (None = fp32); bf16 is
    # the measured v5e win for frozen/inference use (engine ``score_bf16``,
    # policy ``frozen_score_dtype``). ModifiedResNet ignores it (its
    # AttentionPool computes scores in the param dtype already).
    score_dtype: Any = None

    def setup(self):
        if isinstance(self.vision_num_layers, (tuple, list)):
            self.vision_num_heads = self.vision_features * 32 // 64
            self.visual = ModifiedResNet(
                num_layers=self.vision_num_layers,
                features=self.vision_features,
                num_heads=self.vision_num_heads,
                out_features=None if self.vision_return_map else self.embed_dim,
            )
        else:
            self.vision_num_heads = self.vision_features // 64
            self.visual = VisionTransformer(
                patch_size=self.vision_patch_size,
                features=self.vision_features,
                num_layers=self.vision_num_layers,
                num_heads=self.vision_num_heads,
                out_features=None if self.vision_return_map else self.embed_dim,
                score_dtype=self.score_dtype,
            )
        self.text = TextEncoder(
            out_features=self.embed_dim,
            vocab_size=self.vocab_size,
            features=self.text_features,
            num_layers=self.text_num_layers,
            num_heads=self.text_num_heads,
            score_dtype=self.score_dtype,
        )
        self.logit_scale = self.param("logit_scale", jax.nn.initializers.zeros, ())

    def get_logit_scale(self):
        return self.logit_scale

    def encode_image(self, image, normalize: bool = True):
        x = self.visual(image)[0]
        if normalize:
            x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x

    def encode_text(self, text, normalize: bool = True):
        x = self.text(text)
        if normalize:
            x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x

    def __call__(self, image, text, normalize: bool = True) -> Tuple[Any, Any]:
        x = self.encode_image(image, normalize) if image is not None else None
        y = self.encode_text(text, normalize) if text is not None else None
        return x, y


def _model_fn(name):
    def fn(**overrides):
        # overrides: module-level knobs (e.g. score_dtype under the policy's
        # frozen_bf16 recipe) layered over the architecture config
        return CLIP(**{**CONFIGS[name], **overrides})

    return fn


MODELS = {
    "resnet_50": _model_fn("resnet_50"),
    "resnet_101": _model_fn("resnet_101"),
    "resnet_50x4": _model_fn("resnet_50x4"),
    "resnet_50x16": _model_fn("resnet_50x16"),
    "resnet_50x64": _model_fn("resnet_50x64"),
    "vit_b32": _model_fn("vit_b32"),
    "vit_b16": _model_fn("vit_b16"),
    "vit_l14": _model_fn("vit_l14"),
    "vit_b32_clip4clip": _model_fn("vit_b32"),
    "vit_b16_clip4clip": _model_fn("vit_b16"),
}


def load_model_vars(model_name: str, checkpoint_path: Optional[str] = None, download_dir: Optional[str] = None):
    """Load CLIP variables from a local checkpoint.

    Accepts either a converted ``.npy`` of the torch state dict or a raw torch
    ``.pt`` jit archive (converted on the fly).  Unlike the reference
    (openai/model.py:138-171) there is no auto-download — this framework runs
    in egress-free environments; place checkpoints locally and pass the path,
    or set download_dir to a directory containing ``{model_name}.npy``.
    """
    import os

    from .convert import convert_torch_clip_vars

    if checkpoint_path is None:
        if download_dir is None:
            download_dir = os.environ.get("ARP_TPU_CHECKPOINT_DIR", os.path.expanduser("~/.cache/arp_tpu"))
        checkpoint_path = os.path.join(download_dir, model_name + ".npy")
    if not os.path.exists(checkpoint_path):
        # guarded auto-download (sha256-verified, opt-in only): when egress
        # exists this completes the reference's load path (model.py:138-171)
        from .download import CHECKPOINT_URLS, downloads_allowed, fetch_checkpoint

        if model_name in CHECKPOINT_URLS and downloads_allowed():
            checkpoint_path = fetch_checkpoint(model_name, download_dir=download_dir)
        else:
            raise FileNotFoundError(
                f"CLIP checkpoint not found at {checkpoint_path}. Either download "
                f"the OpenAI checkpoint on a connected machine and save its state "
                f"dict as .npy (see arp_tpu/models/clip/convert.py docstring), or "
                f"set ARP_TPU_ALLOW_DOWNLOAD=1 to fetch+sha256-verify it "
                f"automatically (models/clip/download.py)."
            )
    if checkpoint_path.endswith(".pt"):
        import torch

        params = torch.jit.load(checkpoint_path, map_location="cpu").state_dict()
        np_params = {k: v.cpu().numpy() for k, v in params.items()}
    else:
        with open(checkpoint_path, "rb") as f:
            np_params = np.load(f, allow_pickle=True).tolist()
    return convert_torch_clip_vars(np_params)
