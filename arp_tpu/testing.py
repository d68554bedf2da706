"""Shared smoke/test fixtures: tiny CLIP, toy tokenizer, scripted expert.

These back both the test suite and the self-contained smoke paths of the
user-facing tooling (``scripts/reproduce_paper.py --smoke``), so the tiny
model shapes, the toy vocabulary, and the fake-env expert live in exactly one
place.  Nothing here is imported by production code paths.
"""

from __future__ import annotations

import numpy as np

# Tiny CLIP used wherever real ViT-B/16 weights are unnecessary (throughput
# and semantics are weight-independent).  vocab_size must stay consistent
# with TinyTokenizer's id range.
TINY_CLIP_CFG = dict(
    embed_dim=32,
    vocab_size=97,
    vision_num_layers=2,
    vision_features=64,
    vision_patch_size=8,
    text_features=32,
    text_num_heads=4,
    text_num_layers=2,
)
TINY_CLIP_IMG_SIZE = 32  # engines resize frames to this


# Deterministic toy tokenizer over the 97-id tiny vocabulary.  The
# implementation lives in production code (saved engine specs reference it
# by tag — models/clip/tokenizer.py); this alias keeps the historical name.
from .models.clip.tokenizer import Char97Tokenizer as TinyTokenizer  # noqa: E402


def make_tiny_clip_engine(batch_size: int = 8, **engine_kwargs):
    """Random-init tiny CLIP behind the real ClipRewardEngine."""
    import jax
    import jax.numpy as jnp

    from .models.clip import CLIP
    from .reward.engine import ClipRewardEngine

    model = CLIP(**TINY_CLIP_CFG)
    rng = np.random.default_rng(0)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(rng.normal(size=(1, TINY_CLIP_IMG_SIZE, TINY_CLIP_IMG_SIZE, 3)).astype(np.float32)),
        jnp.asarray(TinyTokenizer()("x")),
    )
    engine_kwargs.setdefault("resize_mode", "pil")
    return ClipRewardEngine(
        model=model,
        variables=variables,
        batch_size=batch_size,
        image_size=TINY_CLIP_IMG_SIZE,
        tokenizer=TinyTokenizer(),
        **engine_kwargs,
    )


def scripted_coin_expert(obs):
    """Walks the FakeProcgen agent (red block) toward the goal (gold block)
    using pixel positions — good enough to produce 'expert' demos."""
    img = np.asarray(obs["image"]["ob"])
    gold = np.argwhere((img[:, :, 0] > 200) & (img[:, :, 1] > 180) & (img[:, :, 2] < 100))
    red = np.argwhere((img[:, :, 0] > 150) & (img[:, :, 1] < 100))
    if len(gold) == 0 or len(red) == 0:
        return 0
    gy, gx = gold.mean(axis=0)
    ay, ax = red.mean(axis=0)
    if abs(gx - ax) > abs(gy - ay):
        return 1 if gx > ax else 0
    return 3 if gy > ay else 2
