"""Image decoder probing frozen CLIP latents (reference: finetune_module/decoder.py).

A conv-transpose decoder trained with MSE reconstruction from frozen CLIP
image features — the diagnostic probe for how much visual detail the reward
model's representation retains.  (The reference's driver `reconstruct.py` is
broken — it imports a module stripped from the repo; this one runs.)

Usage::

    decoder = LatentImageDecoder(out_hw=224)
    params = decoder.init(rng, feats)["params"]
    recon = decoder.apply({"params": params}, feats)
    loss = jnp.mean((recon - images) ** 2)
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class LatentImageDecoder(nn.Module):
    """feature vector (B, D) -> image (B, out_hw, out_hw, 3)."""

    out_hw: int = 224
    base_channels: int = 256
    start_hw: int = 7

    @nn.compact
    def __call__(self, features):
        b = features.shape[0]
        ch = self.base_channels
        x = nn.Dense(self.start_hw * self.start_hw * ch)(features)
        x = x.reshape(b, self.start_hw, self.start_hw, ch)
        hw = self.start_hw
        while hw < self.out_hw:
            ch = max(ch // 2, 16)
            x = nn.ConvTranspose(ch, (4, 4), strides=(2, 2), padding="SAME")(x)
            x = nn.gelu(x)
            hw *= 2
        if hw != self.out_hw:
            import jax

            x = jax.image.resize(x, (b, self.out_hw, self.out_hw, x.shape[-1]), "bilinear")
        x = nn.Conv(3, (3, 3), padding="SAME")(x)
        return nn.sigmoid(x)


def reconstruction_loss(decoder_params, decoder, features, images):
    """MSE recon loss; images in [0, 1] (reference decoder.py objective)."""
    recon = decoder.apply({"params": decoder_params}, features)
    return jnp.mean((recon - images) ** 2)
