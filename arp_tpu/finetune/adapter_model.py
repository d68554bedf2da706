"""CLIP multiscale adapter — the ARP-DT+ reward model, in JAX.

Re-design of the reference's PyTorch ``CLIPMultiscaleAdapter``
(finetune_module/clip_multiscale_adapter.py): a frozen CLIP ViT-B/16 whose
per-resblock CLS/EOT features (captured via flax ``capture_intermediates``
instead of torch forward hooks) are concatenated with the final embedding,
projected, passed through gated adapter MLPs, and trained with

  * the VIP loss over (first, t, t+1, last) quadruples:
      (1-γ)·E[-s_0] + log(ε + E[exp(-(r + γ·s_2 - s_1))]),  γ = 0.98
  * an inverse-dynamics loss predicting the action from
      (f(o_t) ∥ f(text), f(o_{t+1}) ∥ f(text)), weighted by a learnable λ.

The CLIP backbone stays frozen: its variables are passed as a separate
(non-trainable) argument; only adapter parameters live in this module's tree.

Residual gating NOTE: this model gates as res*feature + (1-res)*adapter(feature)
with res = sigmoid(4.0) ≈ 0.98 (reference lines 147-151) — the *opposite*
orientation of the policy adapters (ARPDT.py:345). Preserved exactly.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip import CLIP, CONFIGS
from ..models.layers import AdapterMLP
from ..ops.augment import color_jitter
from ..ops.preprocess import clip_preprocess


class ClipMultiscaleAdapter(nn.Module):
    clip_model_name: str = "vit_b16"
    # adapter dims default to the CLIP embed dim (512 for ViT-B/16, matching
    # the reference's hardcoded defaults) and scale with other backbones
    input_dim: int = 0   # 0 -> embed_dim
    hidden_dim: int = 0  # 0 -> 2 * embed_dim
    output_dim: int = 0  # 0 -> embed_dim
    action_dim: int = 15
    num_layers: int = 2
    use_discrete_action: bool = True
    use_vip_loss: bool = True
    use_id_loss: bool = True
    goal_conditioned: bool = False
    gamma: float = 0.98
    # time-contrastive triplet loss (reference clip_adapter.py:133-144; the
    # reference never defines its margin nor calls the helper — dead code
    # there). Here: margin 1.0, off by default, wired when use_tcn_loss=True.
    use_tcn_loss: bool = False
    tcn_margin: float = 1.0

    def setup(self):
        cfg = CONFIGS[self.clip_model_name]
        self.clip_model = CLIP(**cfg)
        # deliberately the TEXT tower's depth: the reference reads
        # clip_model.transformer.layers (clip_multiscale_adapter.py:59), which
        # is the text transformer — equal to the vision depth for ViT-B/16
        # (the only backbone it instantiates) but a reference quirk we keep
        # for checkpoint parity.  For vit_l14 this would read only the lower
        # 12 of 24 visual layers, exactly as the reference would.
        self.num_clip_layers = cfg["text_num_layers"]
        self.visual_dim = cfg["vision_features"]
        self.text_dim = cfg["text_features"]
        L = self.num_clip_layers

        embed_dim = cfg["embed_dim"]
        out_dim = self.output_dim or embed_dim
        hid_dim = self.hidden_dim or 2 * embed_dim
        # multiscale feature = L intermediate projections (text_dim each) +
        # the final embedding; the gated adapter must preserve that width
        feat_dim = self.text_dim * L + embed_dim
        self.image_intermediate_linear = nn.Dense(self.text_dim * L, use_bias=False)
        self.text_intermediate_linear = nn.Dense(self.text_dim * L, use_bias=False)
        self.image_adapter = AdapterMLP(
            hidden_dim=hid_dim * (L + 1),
            output_dim=feat_dim,
            num_layers=self.num_layers,
        )
        self.text_adapter = AdapterMLP(
            hidden_dim=hid_dim * (L + 1),
            output_dim=feat_dim,
            num_layers=self.num_layers,
        )
        self.inverse_layer = AdapterMLP(
            hidden_dim=hid_dim,
            output_dim=self.action_dim,
            num_layers=self.num_layers,
        )
        self.image_residual_weight = self.param("image_residual_weight", nn.initializers.constant(4.0), ())
        self.text_residual_weight = self.param("text_residual_weight", nn.initializers.constant(4.0), ())
        self.lambda_id = self.param(
            "lambda_id", nn.initializers.constant(float(np.log(1 / 0.07))), ()
        )

    # -- encoders --------------------------------------------------------------

    def adapt_image_features(self, intermediate_cls, final):
        """Adapter head over trunk outputs: per-layer CLS tokens
        (B, L*visual_dim, layer order 0..L-1) + the projected final embedding
        (B, embed_dim).  Shared by the flax trunk path (encode_image) and the
        packed fast trunk (ops/vit_infer.py) — one home for the head math."""
        intermediate = self.image_intermediate_linear(intermediate_cls)
        feature = jnp.concatenate([intermediate, final], axis=-1)
        res = nn.sigmoid(self.image_residual_weight)
        adapted = res * feature + (1.0 - res) * self.image_adapter(feature)
        return adapted / jnp.linalg.norm(adapted, axis=-1, keepdims=True)

    def encode_image(self, clip_variables, image):
        """image: preprocessed (B, 224, 224, 3) -> normalized multiscale feature."""
        final, state = self.clip_model.apply(
            clip_variables,
            image,
            normalize=False,
            method=self.clip_model.encode_image,
            capture_intermediates=True,
            mutable=["intermediates"],
        )
        inter = state["intermediates"]["visual"]["transformer"]
        feats = [
            inter[f"intermediate_layer_{i}"][0][:, 0, :] for i in range(self.num_clip_layers)
        ]
        return self.adapt_image_features(jnp.concatenate(feats, axis=-1), final)

    def encode_text(self, clip_variables, text):
        """text: (B, 77) or (B, n_text, 77) int tokens."""
        text_shape = text.shape
        if text.ndim == 3:
            text = text.reshape(-1, text_shape[-1])
        final, state = self.clip_model.apply(
            clip_variables,
            text,
            normalize=False,
            method=self.clip_model.encode_text,
            capture_intermediates=True,
            mutable=["intermediates"],
        )
        inter = state["intermediates"]["text"]["transformer"]
        eot = text.argmax(-1)
        batch_idx = jnp.arange(text.shape[0])
        feats = [
            inter[f"intermediate_layer_{i}"][0][batch_idx, eot] for i in range(self.num_clip_layers)
        ]
        intermediate = self.text_intermediate_linear(jnp.concatenate(feats, axis=-1))
        feature = jnp.concatenate([intermediate, final], axis=-1)
        res = nn.sigmoid(self.text_residual_weight)
        adapted = res * feature + (1.0 - res) * self.text_adapter(feature)
        adapted = adapted / jnp.linalg.norm(adapted, axis=-1, keepdims=True)
        if len(text_shape) == 3:
            adapted = adapted.reshape(text_shape[0], text_shape[1], -1).mean(axis=1)
        return adapted

    def preprocess(self, x, rng=None, train=False):
        """uint8 (B, H, W, 3) -> CLIP input; train adds batch-shared color jitter
        (reference: kornia ColorJitter(0.1, 0.2, 0.2, 0.03) p=0.75, same_on_batch)."""
        x = clip_preprocess(x, resize_mode="fast")
        if train and rng is not None:
            apply_rng, jitter_rng = jax.random.split(rng)
            # undo normalization, jitter in [0,1], renormalize
            from ..models.clip.model import IMAGE_MEAN, IMAGE_STD

            mean = jnp.asarray(IMAGE_MEAN, jnp.float32)
            std = jnp.asarray(IMAGE_STD, jnp.float32)
            raw = jnp.clip(x * std + mean, 0.0, 1.0)
            jittered = jax.vmap(
                lambda img: color_jitter(img, jitter_rng, 0.1, 0.2, 0.2, 0.03)
            )(raw)
            apply_p = jax.random.uniform(apply_rng, ()) < 0.75
            raw = jnp.where(apply_p, jittered, raw)
            x = (raw - mean) / std
        return x

    # -- loss --------------------------------------------------------------

    def tcn_distance(self, x1, x2):
        """Squared L2 over the feature axis (reference clip_adapter.py:133-138;
        a single (D,) vector yields a scalar distance)."""
        return jnp.sum((x1 - x2) ** 2, axis=-1)

    def tcn_loss(self, anchor, positive, negative):
        """Triplet hinge: mean(max(0, margin + d(a,p) - d(a,n)))."""
        d_pos = self.tcn_distance(anchor, positive)
        d_neg = self.tcn_distance(anchor, negative)
        return jnp.mean(jnp.maximum(self.tcn_margin + d_pos - d_neg, 0.0))

    def __call__(self, clip_variables, batch, train=True):
        """batch: image0..3 (dict key -> (B, H, W, 3) uint8), instruct, action, r."""
        total_loss = 0.0
        metrics = {}
        rng = self.make_rng("aug") if train else None
        image_keys = list(batch["image1"].keys())
        for key in image_keys:
            batch_size = batch["image1"][key].shape[0]
            total_image = jnp.concatenate(
                [batch[f"image{i}"][key] for i in range(4)], axis=0
            )
            processed = self.preprocess(total_image, rng=rng, train=train)
            img0, img1, img2, img3 = jnp.split(processed, 4, axis=0)

            f0 = self.encode_image(clip_variables, img0)
            f1 = self.encode_image(clip_variables, img1)
            f2 = self.encode_image(clip_variables, img2)

            if self.goal_conditioned:
                f3 = self.encode_image(clip_variables, img3)
                score_0 = -jnp.linalg.norm(f3 - f0, axis=-1)
                score_1 = -jnp.linalg.norm(f3 - f1, axis=-1)
                score_2 = -jnp.linalg.norm(f3 - f2, axis=-1)
                cond = f3
            else:
                logit_scale = jnp.exp(clip_variables["params"]["logit_scale"])
                text_feat = self.encode_text(clip_variables, batch["instruct"])
                score_0 = logit_scale * jnp.sum(f0 * text_feat, axis=-1)
                score_1 = logit_scale * jnp.sum(f1 * text_feat, axis=-1)
                score_2 = logit_scale * jnp.sum(f2 * text_feat, axis=-1)
                cond = text_feat

            # VIP loss over quadruples (reference lines 224-228)
            r = batch["r"].reshape(-1).astype(jnp.float32) - 1.0
            epsilon = 1e-8
            vip_loss = (1 - self.gamma) * (-jnp.mean(score_0)) + jnp.log(
                epsilon + jnp.mean(jnp.exp(-(r + self.gamma * score_2 - score_1)))
            )

            # inverse-dynamics loss (reference lines 231-244)
            concat = jnp.concatenate(
                [jnp.concatenate([f1, cond], -1), jnp.concatenate([f2, cond], -1)], axis=-1
            )
            action_logits = self.inverse_layer(concat)
            if self.use_discrete_action:
                labels = batch["action"].reshape(-1).astype(jnp.int32)
                onehot = jax.nn.one_hot(labels, self.action_dim)
                id_loss = -jnp.mean(jnp.sum(onehot * jax.nn.log_softmax(action_logits), axis=-1))
                metrics[f"{key}_id_acc"] = jnp.mean(action_logits.argmax(-1) == labels)
            else:
                id_loss = jnp.mean((action_logits - batch["action"]) ** 2)

            if self.use_vip_loss:
                total_loss = total_loss + vip_loss
            if self.use_id_loss:
                # raw learnable multiplier, exact reference parity
                # (clip_multiscale_adapter.py:111,250 — not exp(lambda); the
                # optimizer can in principle drive it negative, as there)
                total_loss = total_loss + self.lambda_id * id_loss
            if not self.use_vip_loss and not self.use_id_loss:
                total_loss = total_loss + vip_loss + id_loss
            if self.use_tcn_loss:
                # anchor f(o_t), positive f(o_{t+1}) (adjacent), negative
                # f(o_start) (temporally distant)
                tcn = self.tcn_loss(f1, f2, f0)
                total_loss = total_loss + tcn
                metrics[f"{key}_tcn_loss"] = tcn
            metrics[f"{key}_vip_loss"] = vip_loss
            metrics[f"{key}_id_loss"] = id_loss
        return total_loss, metrics
