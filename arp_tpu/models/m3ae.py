"""M3AE (masked multimodal autoencoder) and MAE encoders.

Re-implementation of the reference encoders (arp_dt/models/m3ae/model.py) on
the shared fused-attention transformer stack (arp_tpu/models/layers.py):
``forward_representation`` / ``forward_gc_representations`` drive the policy
models; ``forward_encoder``+``forward_decoder`` give the full masked-
autoencoding training objective; per-layer intermediates are sowed for the
InstructRL-style multi-layer feature concat.

Reference checkpoints (pickled flax params with auto-generated module names,
m3ae/model.py:996-1015) load through :func:`convert_reference_m3ae_params`.
"""

from __future__ import annotations

from typing import Optional

import einops

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from ml_collections import ConfigDict

from ..config import update_config
from ..utils import get_1d_sincos_pos_embed, get_2d_sincos_pos_embed
from .layers import MLP, Transformer, resolve_compute_dtype
from ..ops.masks import MaskSpec


def extract_patches(inputs, patch_size: int):
    """(B, H, W, C) images -> (B, N, P*P*C) patch vectors.

    Patch ordering is row-major over the patch grid, with each vector laid out
    (p_row, p_col, channel) — the layout the reference's patchify produces
    (m3ae/model.py extract_patches), which converted checkpoints assume.
    """
    return einops.rearrange(
        inputs, "b (gh p) (gw q) c -> b (gh gw) (p q c)", p=patch_size, q=patch_size
    )


def merge_patches(inputs, patch_size: int):
    """Inverse of :func:`extract_patches` for square patch grids."""
    side = int(inputs.shape[1] ** 0.5)
    return einops.rearrange(
        inputs, "b (gh gw) (p q c) -> b (gh p) (gw q) c", gh=side, gw=side, p=patch_size, q=patch_size
    )


def random_masking(x, rng, keep_len, padding_mask=None):
    """MAE-style random token drop, one shared permutation per batch.

    Semantics (and the exact permutation, for checkpoint-parity with
    m3ae/model.py:143-157): positions are ranked by an argsort over a uniform
    draw of length ``seq_len``; the ``keep_len`` best-ranked survive.

    Returns ``(kept_tokens, drop_mask, unshuffle_ids[, kept_padding_mask])``
    where ``drop_mask[b, j] = 1.0`` iff position ``j`` was dropped, and
    ``unshuffle_ids`` restores decoder outputs to original order.
    """
    seq_len = x.shape[1]
    rank = jnp.argsort(jax.random.uniform(rng, (seq_len,), dtype=jnp.float32))
    unshuffle = jnp.argsort(rank)
    keep_ids = rank[:keep_len]
    kept = x[:, keep_ids]
    # position j survives iff its rank index is < keep_len
    dropped = (unshuffle >= keep_len).astype(jnp.float32)
    drop_mask = jnp.broadcast_to(dropped, (x.shape[0], seq_len))
    if padding_mask is None:
        return kept, drop_mask, unshuffle
    return kept, drop_mask, unshuffle, padding_mask[:, keep_ids]


def cross_entropy_loss_and_accuracy(logits, tokens, valid=None):
    """Per-sequence-normalized masked CE + accuracy (m3ae loss semantics).

    Each sequence's token losses are summed and divided by its own valid
    count before averaging over the batch, so short sequences are not
    down-weighted.
    """
    if valid is None:
        valid = jnp.ones(tokens.shape[:2])
    live = valid > 0.0
    per_seq = jnp.maximum(valid.sum(axis=-1), 1e-5)
    token_logp = jnp.take_along_axis(
        jax.nn.log_softmax(logits, axis=-1), tokens[..., None], axis=-1
    )[..., 0]
    loss = -jnp.mean(jnp.where(live, token_logp, 0.0).sum(axis=-1) / per_seq)
    hits = live & (jnp.argmax(logits, axis=-1) == tokens)
    accuracy = jnp.mean(hits.sum(axis=-1) / per_seq)
    return loss, accuracy


def patch_mse_loss(patch_output, patch_target, valid=None):
    """Masked MSE over patches, normalized by each sequence's valid fraction."""
    if valid is None:
        valid = jnp.ones(patch_target.shape[:2])
    per_patch = jnp.square(patch_target - patch_output).mean(axis=-1)
    masked = jnp.where(valid > 0.0, per_patch, 0.0).mean(axis=-1)
    valid_frac = valid.sum(axis=-1) / valid.shape[-1]
    return jnp.mean(masked / valid_frac)


def get_transformer_by_config(model_type: str, config: ConfigDict) -> None:
    presets = {
        "small": dict(emb_dim=384, depth=12, num_heads=6),
        "base": dict(emb_dim=768, depth=12, num_heads=12),
        "large": dict(emb_dim=1024, depth=24, num_heads=16),
        "huge": dict(emb_dim=1280, depth=32, num_heads=16),
        "debug": dict(emb_dim=1024, depth=2, num_heads=16),
    }
    if model_type not in presets:
        # unknown/custom names keep the explicitly configured dims
        return
    for k, v in presets[model_type].items():
        setattr(config, k, v)
    config.dec_emb_dim = 512
    config.dec_depth = 8 if model_type != "debug" else 2
    config.dec_num_heads = 16
    config.mlp_ratio = 4


class MaskedMultimodalAutoencoder(nn.Module):
    config_updates: ... = None
    text_vocab_size: int = -1
    image_output_dim: int = 768

    @staticmethod
    @nn.nowrap
    def get_default_config(updates=None):
        config = ConfigDict()
        config.model_type = "base"
        config.emb_dim = 1024
        config.dec_emb_dim = 512
        config.depth = 24
        config.dec_depth = 8
        config.num_heads = 16
        config.dec_num_heads = 16
        config.mlp_ratio = 4
        config.output_head_depth = 0
        config.att_drop = 0.0
        config.drop = 0.0
        config.remat = False
        config.compute_dtype = "float32"
        # "bfloat16" runs layernorms + the residual stream in bf16 too — the
        # frozen-tower full-cast inference recipe (models/layers.py::Block.
        # ln_dtype). Only for frozen (stop_gradient) encoders; keep "float32"
        # when the encoder itself trains.
        config.ln_dtype = "float32"
        # attention score/softmax dtype; "bfloat16" halves the (B, H, N, N)
        # score-tensor HBM traffic of the encoder — the largest byte term of
        # the frozen-tower forward at 257 tokens. Chip-dependent (measure:
        # scripts/bench_m3ae_dtype.py); default fp32 is the oracle recipe.
        config.score_dtype = "float32"
        config.drop_path = 0.0
        config.image_mask_ratio = 0.75
        config.text_mask_ratio = 0.75
        config.use_type_embedding = True
        update_config(config, updates)
        if config.model_type is not None:
            get_transformer_by_config(config.model_type, config)
        return config

    @nn.nowrap
    def rng_keys(self):
        return ("params", "noise", "drop_path", "dropout")

    @nn.nowrap
    def no_decay_list(self):
        return [
            "cls_token",
            "encoder_image_type_embedding",
            "encoder_text_type_embedding",
            "image_mask_embedding",
            "text_mask_embedding",
            "text_embedding",
        ]

    def setup(self):
        self.config = self.get_default_config(self.config_updates)
        assert self.text_vocab_size > 0
        cfg = self.config

        self.text_embedding = nn.Embed(
            self.text_vocab_size, cfg.emb_dim, embedding_init=jax.nn.initializers.normal(stddev=1.0)
        )
        self.image_embedding = nn.Dense(cfg.emb_dim, kernel_init=nn.initializers.xavier_uniform())
        if cfg.use_type_embedding:
            norm02 = nn.initializers.normal(stddev=0.02, dtype=jnp.float32)
            self.encoder_image_type_embedding = self.param(
                "encoder_image_type_embedding", norm02, (1, 1, cfg.emb_dim)
            )
            self.decoder_image_type_embedding = self.param(
                "decoder_image_type_embedding", norm02, (1, 1, cfg.dec_emb_dim)
            )
            self.encoder_text_type_embedding = self.param(
                "encoder_text_type_embedding", norm02, (1, 1, cfg.emb_dim)
            )
            self.decoder_text_type_embedding = self.param(
                "decoder_text_type_embedding", norm02, (1, 1, cfg.dec_emb_dim)
            )
        norm02 = nn.initializers.normal(stddev=0.02, dtype=jnp.float32)
        self.cls_token = self.param("cls_token", norm02, (1, 1, cfg.emb_dim))
        self.image_mask_embedding = self.param("image_mask_embedding", norm02, (1, 1, cfg.dec_emb_dim))
        self.text_mask_embedding = self.param("text_mask_embedding", norm02, (1, 1, cfg.dec_emb_dim))

        kwargs = dict(
            att_drop=cfg.att_drop, drop=cfg.drop, drop_path=cfg.drop_path,
            mlp_ratio=cfg.mlp_ratio, mlp_bias=True, sow_intermediates=True,
            remat=cfg.get("remat", False),
            compute_dtype=resolve_compute_dtype(cfg.get("compute_dtype", "float32")),
            ln_dtype=resolve_compute_dtype(cfg.get("ln_dtype", "float32")),
            score_dtype=resolve_compute_dtype(cfg.get("score_dtype", "float32")),
        )
        self.encoder = Transformer(emb_dim=cfg.emb_dim, depth=cfg.depth, num_heads=cfg.num_heads, **kwargs)
        self.decoder = Transformer(
            emb_dim=cfg.dec_emb_dim, depth=cfg.dec_depth, num_heads=cfg.dec_num_heads, **kwargs
        )
        self.decoder_input_projection = nn.Dense(cfg.dec_emb_dim, kernel_init=nn.initializers.xavier_uniform())
        self.decoder_image_output = MLP(
            cfg.dec_emb_dim, self.image_output_dim, cfg.output_head_depth,
            input_norm=cfg.output_head_depth > 0,
        )
        self.decoder_text_output = MLP(
            cfg.dec_emb_dim, self.text_vocab_size, cfg.output_head_depth,
            input_norm=cfg.output_head_depth > 0,
        )

    def get_type_embedding(self, name):
        if self.config.use_type_embedding:
            return {
                "encoder_image_type_embedding": self.encoder_image_type_embedding,
                "encoder_text_type_embedding": self.encoder_text_type_embedding,
                "decoder_image_type_embedding": self.decoder_image_type_embedding,
                "decoder_text_type_embedding": self.decoder_text_type_embedding,
            }[name]
        return 0.0

    def _embed_image(self, image):
        return (
            self.image_embedding(image)
            + get_2d_sincos_pos_embed(self.config.emb_dim, image.shape[1])
            + self.get_type_embedding("encoder_image_type_embedding")
        )

    def _embed_text(self, text):
        return (
            self.text_embedding(text)
            + get_1d_sincos_pos_embed(self.config.emb_dim, text.shape[1])
            + self.get_type_embedding("encoder_text_type_embedding")
        )

    def forward_representation(self, image, text, text_padding_mask, deterministic=False):
        batch_size = image.shape[0]
        cls_token = jnp.broadcast_to(self.cls_token, (batch_size, 1, self.config.emb_dim))
        tensors = [cls_token]
        paddings = [jnp.zeros((batch_size, 1), dtype=jnp.float32)]
        if image is not None:
            tensors.append(self._embed_image(image))
            paddings.append(jnp.zeros((batch_size, image.shape[1]), dtype=jnp.float32))
        if text is not None:
            tensors.append(self._embed_text(text))
            paddings.append(text_padding_mask)
        x = jnp.concatenate(tensors, axis=1)
        # image-only encode: the mask would be all-zeros (nothing padded), but
        # as a *runtime* input XLA cannot fold the (B,H,N,N) mask combine away
        # — pass None so the attention never builds it (identical numerics)
        padding_mask = jnp.concatenate(paddings, axis=1) if text is not None else None
        return self.encoder(x, deterministic, MaskSpec("none"), padding_mask)

    def forward_gc_representations(self, image, goal_image, deterministic=False):
        """Joint (obs, goal) encoding for GCBC (reference: m3ae/model.py:498-525)."""
        assert image.shape == goal_image.shape
        batch_size = image.shape[0]
        cls_token = jnp.broadcast_to(self.cls_token, (batch_size, 1, self.config.emb_dim))
        tensors = [cls_token, self._embed_image(image), self._embed_image(goal_image)]
        x = jnp.concatenate(tensors, axis=1)
        return self.encoder(x, deterministic, MaskSpec("none"), None)


    def forward_encoder(self, image, text, text_padding_mask, deterministic=False):
        batch_size = image.shape[0] if image is not None else text.shape[0]
        cls_token = jnp.broadcast_to(self.cls_token, (batch_size, 1, self.config.emb_dim))
        tensors = [cls_token]
        paddings = [jnp.zeros((batch_size, 1), dtype=jnp.float32)]

        if image is not None:
            image_keep_length = int(image.shape[1] * (1.0 - self.config.image_mask_ratio))
            image_x, image_mask, image_ids_restore = random_masking(
                self._embed_image(image), self.make_rng("noise"), image_keep_length
            )
            tensors.append(image_x)
            paddings.append(jnp.zeros((batch_size, image_keep_length), dtype=jnp.float32))
        else:
            image_mask = image_ids_restore = None

        if text is not None:
            text_keep_length = int(text.shape[1] * (1.0 - self.config.text_mask_ratio))
            text_x, text_mask, text_ids_restore, text_padding_mask = random_masking(
                self._embed_text(text), self.make_rng("noise"), text_keep_length, text_padding_mask
            )
            tensors.append(text_x)
            paddings.append(text_padding_mask)
        else:
            text_mask = text_ids_restore = text_padding_mask = None

        x = jnp.concatenate(tensors, axis=1)
        padding_mask = jnp.concatenate(paddings, axis=1)
        x = self.encoder(x, deterministic, MaskSpec("none"), padding_mask)

        cls_x = x[:, :1, :]
        if image is None:
            image_x, text_x = None, x[:, 1:, :]
        elif text is None:
            image_x, text_x = x[:, 1:, :], None
        else:
            image_x = x[:, 1 : image_keep_length + 1, :]
            text_x = x[:, image_keep_length + 1 :, :]
        return cls_x, image_x, text_x, image_mask, text_mask, image_ids_restore, text_ids_restore

    def forward_decoder(
        self, cls_x, image_x, text_x, image_ids_restore, text_ids_restore, text_padding_mask,
        deterministic=False,
    ):
        batch_size = cls_x.shape[0]
        cfg = self.config
        tensors = [self.decoder_input_projection(cls_x)]
        paddings = [jnp.zeros((batch_size, 1), dtype=jnp.float32)]

        if image_x is not None:
            image_keep_length = int(image_ids_restore.shape[0] * (1.0 - cfg.image_mask_ratio))
            image_x = self.decoder_input_projection(image_x)
            masked = jnp.broadcast_to(
                self.image_mask_embedding,
                (batch_size, image_ids_restore.shape[0] - image_keep_length, cfg.dec_emb_dim),
            )
            image_x = jnp.concatenate([image_x, masked], axis=1)[:, image_ids_restore]
            image_x = (
                image_x
                + get_2d_sincos_pos_embed(cfg.dec_emb_dim, image_ids_restore.shape[0])
                + self.get_type_embedding("decoder_image_type_embedding")
            )
            tensors.append(image_x)
            paddings.append(jnp.zeros((batch_size, image_ids_restore.shape[0]), dtype=jnp.float32))

        if text_x is not None:
            text_keep_length = int(text_ids_restore.shape[0] * (1.0 - cfg.text_mask_ratio))
            text_x = self.decoder_input_projection(text_x)
            masked = jnp.broadcast_to(
                self.text_mask_embedding,
                (batch_size, text_ids_restore.shape[0] - text_keep_length, cfg.dec_emb_dim),
            )
            text_x = jnp.concatenate([text_x, masked], axis=1)[:, text_ids_restore]
            text_x = (
                text_x
                + get_1d_sincos_pos_embed(cfg.dec_emb_dim, text_ids_restore.shape[0])
                + self.get_type_embedding("decoder_text_type_embedding")
            )
            tensors.append(text_x)
            paddings.append(text_padding_mask)

        x = jnp.concatenate(tensors, axis=1)
        padding_mask = jnp.concatenate(paddings, axis=1)
        x = self.decoder(x, deterministic, MaskSpec("none"), padding_mask)

        if image_x is None:
            return None, self.decoder_text_output(x[:, 1:, :])
        if text_x is None:
            return self.decoder_image_output(x[:, 1:, :]), None
        n_img = image_ids_restore.shape[0]
        return (
            self.decoder_image_output(x[:, 1 : n_img + 1, :]),
            self.decoder_text_output(x[:, n_img + 1 :, :]),
        )

    def __call__(self, image, text, text_padding_mask, deterministic=False):
        cls_x, image_x, text_x, image_mask, text_mask, image_ids_restore, text_ids_restore = (
            self.forward_encoder(image, text, text_padding_mask, deterministic)
        )
        image_output, text_output = self.forward_decoder(
            cls_x, image_x, text_x, image_ids_restore, text_ids_restore, text_padding_mask, deterministic
        )
        return image_output, text_output, image_mask, text_mask


class MaskedAutoencoder(nn.Module):
    """Image-only MAE (reference: m3ae/model.py:685-865)."""

    config_updates: ... = None
    image_output_dim: int = 768

    @staticmethod
    @nn.nowrap
    def get_default_config(updates=None):
        config = ConfigDict()
        config.model_type = "base"
        config.emb_dim = 1024
        config.dec_emb_dim = 512
        config.depth = 24
        config.dec_depth = 8
        config.num_heads = 16
        config.dec_num_heads = 16
        config.mlp_ratio = 4
        config.output_head_depth = 0
        config.att_drop = 0.0
        config.drop = 0.0
        config.remat = False
        config.compute_dtype = "float32"
        # "bfloat16" runs layernorms + the residual stream in bf16 too — the
        # frozen-tower full-cast inference recipe (models/layers.py::Block.
        # ln_dtype). Only for frozen (stop_gradient) encoders; keep "float32"
        # when the encoder itself trains.
        config.ln_dtype = "float32"
        # attention score/softmax dtype; "bfloat16" halves the (B, H, N, N)
        # score-tensor HBM traffic of the encoder — the largest byte term of
        # the frozen-tower forward at 257 tokens. Chip-dependent (measure:
        # scripts/bench_m3ae_dtype.py); default fp32 is the oracle recipe.
        config.score_dtype = "float32"
        config.drop_path = 0.0
        config.image_mask_ratio = 0.75
        config.use_type_embedding = True
        update_config(config, updates)
        if config.model_type is not None:
            get_transformer_by_config(config.model_type, config)
        return config

    @nn.nowrap
    def rng_keys(self):
        return ("params", "noise", "drop_path", "dropout")

    @nn.nowrap
    def no_decay_list(self):
        return ["cls_token", "encoder_image_type_embedding", "image_mask_embedding"]

    def setup(self):
        self.config = self.get_default_config(self.config_updates)
        cfg = self.config
        norm02 = nn.initializers.normal(stddev=0.02, dtype=jnp.float32)
        self.image_embedding = nn.Dense(cfg.emb_dim, kernel_init=nn.initializers.xavier_uniform())
        if cfg.use_type_embedding:
            self.encoder_image_type_embedding = self.param(
                "encoder_image_type_embedding", norm02, (1, 1, cfg.emb_dim)
            )
            self.decoder_image_type_embedding = self.param(
                "decoder_image_type_embedding", norm02, (1, 1, cfg.dec_emb_dim)
            )
        self.cls_token = self.param("cls_token", norm02, (1, 1, cfg.emb_dim))
        self.image_mask_embedding = self.param("image_mask_embedding", norm02, (1, 1, cfg.dec_emb_dim))
        kwargs = dict(
            att_drop=cfg.att_drop, drop=cfg.drop, drop_path=cfg.drop_path,
            mlp_ratio=cfg.mlp_ratio, mlp_bias=True, sow_intermediates=True,
            remat=cfg.get("remat", False),
            compute_dtype=resolve_compute_dtype(cfg.get("compute_dtype", "float32")),
            ln_dtype=resolve_compute_dtype(cfg.get("ln_dtype", "float32")),
            score_dtype=resolve_compute_dtype(cfg.get("score_dtype", "float32")),
        )
        self.encoder = Transformer(emb_dim=cfg.emb_dim, depth=cfg.depth, num_heads=cfg.num_heads, **kwargs)
        self.decoder = Transformer(
            emb_dim=cfg.dec_emb_dim, depth=cfg.dec_depth, num_heads=cfg.dec_num_heads, **kwargs
        )
        self.decoder_input_projection = nn.Dense(cfg.dec_emb_dim, kernel_init=nn.initializers.xavier_uniform())
        self.decoder_image_output = MLP(
            cfg.dec_emb_dim, self.image_output_dim, cfg.output_head_depth,
            input_norm=cfg.output_head_depth > 0,
        )

    def get_type_embedding(self, name):
        if self.config.use_type_embedding:
            return {
                "encoder_image_type_embedding": self.encoder_image_type_embedding,
                "decoder_image_type_embedding": self.decoder_image_type_embedding,
            }[name]
        return 0.0

    def _embed_image(self, image):
        return (
            self.image_embedding(image)
            + get_2d_sincos_pos_embed(self.config.emb_dim, image.shape[1])
            + self.get_type_embedding("encoder_image_type_embedding")
        )

    def forward_representation(self, image, deterministic=False):
        batch_size = image.shape[0]
        cls_token = jnp.broadcast_to(self.cls_token, (batch_size, 1, self.config.emb_dim))
        x = jnp.concatenate([cls_token, self._embed_image(image)], axis=1)
        return self.encoder(x, deterministic, MaskSpec("none"))

    def forward_encoder(self, image, deterministic=False):
        batch_size = image.shape[0]
        keep = int(image.shape[1] * (1.0 - self.config.image_mask_ratio))
        image_x, image_mask, ids_restore = random_masking(
            self._embed_image(image), self.make_rng("noise"), keep
        )
        cls_token = jnp.broadcast_to(self.cls_token, (batch_size, 1, self.config.emb_dim))
        x = jnp.concatenate([cls_token, image_x], axis=1)
        return self.encoder(x, deterministic, MaskSpec("none")), image_mask, ids_restore

    def forward_decoder(self, x, ids_restore, deterministic=False):
        batch_size = x.shape[0]
        cfg = self.config
        keep = int(ids_restore.shape[0] * (1.0 - cfg.image_mask_ratio))
        x = self.decoder_input_projection(x)
        cls_x, image_x = x[:, :1, :], x[:, 1:, :]
        masked = jnp.broadcast_to(
            self.image_mask_embedding, (batch_size, ids_restore.shape[0] - keep, cfg.dec_emb_dim)
        )
        image_x = jnp.concatenate([image_x, masked], axis=1)[:, ids_restore]
        image_x = (
            image_x
            + get_2d_sincos_pos_embed(cfg.dec_emb_dim, ids_restore.shape[0])
            + self.get_type_embedding("decoder_image_type_embedding")
        )
        x = jnp.concatenate([cls_x, image_x], axis=1)
        x = self.decoder(x, deterministic, MaskSpec("none"))
        return self.decoder_image_output(x[:, 1:, :])

    def __call__(self, image, deterministic=False):
        x, image_mask, ids_restore = self.forward_encoder(image, deterministic)
        image_output = self.forward_decoder(x, ids_restore, deterministic)
        return image_output, image_mask, x


# --- Reference-checkpoint ingestion -----------------------------------------


def convert_reference_m3ae_params(ref_params):
    """Map reference auto-named m3ae params onto this module tree.

    Reference naming (m3ae/model.py, @nn.compact auto names):
      encoder/Block_i/LayerNorm_0        -> encoder/blocks_i/norm1
      encoder/Block_i/Attention_0/Dense_0 -> encoder/blocks_i/attn/qkv
      encoder/Block_i/Attention_0/Dense_1 -> encoder/blocks_i/attn/attn_out
      encoder/Block_i/LayerNorm_1        -> encoder/blocks_i/norm2
      encoder/Block_i/TransformerMLP_0/* -> encoder/blocks_i/mlp/*
      encoder/LayerNorm_0                -> encoder/norm
    (same for decoder); all other names are identical.
    """
    ref_params = flax.core.unfreeze(ref_params)
    if "params" in ref_params:
        ref_params = ref_params["params"]
    flat = flax.traverse_util.flatten_dict(ref_params)
    out = {}
    for path, value in flat.items():
        parts = list(path)
        new_parts = []
        for i, p in enumerate(parts):
            if p.startswith("Block_"):
                new_parts.append("blocks_" + p.split("_")[1])
            elif p == "Attention_0":
                new_parts.append("attn")
            elif p in ("TransformerMLP_0", "FeedForward_0"):
                new_parts.append("mlp")
            elif p == "LayerNorm_0" and i > 0 and parts[i - 1].startswith("Block_"):
                new_parts.append("norm1")
            elif p == "LayerNorm_1" and i > 0 and parts[i - 1].startswith("Block_"):
                new_parts.append("norm2")
            elif p == "LayerNorm_0" and (i == 0 or parts[i - 1] in ("encoder", "decoder")):
                # final norm of a Transformer stack (standalone or named)
                new_parts.append("norm")
            elif p == "Dense_0" and new_parts and new_parts[-1] == "attn":
                new_parts.append("qkv")
            elif p == "Dense_1" and new_parts and new_parts[-1] == "attn":
                new_parts.append("attn_out")
            else:
                new_parts.append(p)
        out[tuple(new_parts)] = jnp.asarray(value)
    return flax.core.freeze({"params": flax.traverse_util.unflatten_dict(out)})


def export_reference_m3ae_params(params):
    """Inverse of :func:`convert_reference_m3ae_params`: rename this module
    tree back to the reference's auto-generated names, producing a tree that
    the reference m3ae (and our own loader) can consume.  Round-trip is
    exact (tested); the reference's ``FeedForward_0`` name is used for the
    MLP (its m3ae calls the class TransformerMLP in some revisions —
    convert_reference_m3ae_params accepts both)."""
    params = flax.core.unfreeze(params)
    if "params" in params:
        params = params["params"]
    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    for path, value in flat.items():
        parts = list(path)
        new_parts = []
        for i, p in enumerate(parts):
            if p.startswith("blocks_"):
                new_parts.append("Block_" + p.split("_")[1])
            elif p == "attn":
                new_parts.append("Attention_0")
            elif p == "mlp" and new_parts and new_parts[-1].startswith("Block_"):
                new_parts.append("FeedForward_0")
            elif p == "norm1":
                new_parts.append("LayerNorm_0")
            elif p == "norm2":
                new_parts.append("LayerNorm_1")
            elif p == "norm" and (i == 0 or parts[i - 1] in ("encoder", "decoder")):
                new_parts.append("LayerNorm_0")
            elif p == "qkv":
                new_parts.append("Dense_0")
            elif p == "attn_out":
                new_parts.append("Dense_1")
            else:
                new_parts.append(p)
        out[tuple(new_parts)] = np.asarray(value)
    return {"params": flax.traverse_util.unflatten_dict(out)}


def load_m3ae_model_vars(model_name_or_path: str, checkpoint_dir: Optional[str] = None):
    """Load reference m3ae pickled params from a local path and convert."""
    import os
    import pickle

    paths = {
        "vit_s16": "m3ae_small_params.pkl",
        "vit_b16": "m3ae_base_params.pkl",
        "vit_l16": "m3ae_large_params.pkl",
    }
    path = model_name_or_path
    if model_name_or_path in paths:
        base = checkpoint_dir or os.environ.get("ARP_TPU_CHECKPOINT_DIR", os.path.expanduser("~/.cache/arp_tpu"))
        path = os.path.join(base, paths[model_name_or_path])
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"m3ae checkpoint not found at {path}; place the pickled params there "
            f"or pass an explicit path."
        )
    with open(path, "rb") as f:
        ref_params = pickle.load(f)
    return convert_reference_m3ae_params(ref_params)


M3AE_MODEL_CONFIGS = {
    "vit_s16": "small",
    "vit_b16": "base",
    "vit_l16": "large",
}
