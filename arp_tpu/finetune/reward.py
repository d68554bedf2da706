"""clip_ft reward engine: labeling/eval with the fine-tuned adapter.

Gives the ``model_type=clip_ft`` path for arp_tpu.reward.labeler and the
``vl_type=clip_ft`` path for rollout eval (reference: label_reward.py:165-230,
envs/vl_reward.py:44-79), using the JAX adapter instead of torch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip import load_model_vars
from ..ops.preprocess import clip_preprocess
from ..reward.engine import ClipRewardEngine
from .adapter_model import ClipMultiscaleAdapter


def load_adapter_params(path: str):
    """Load adapter params from an orbax checkpoint dir or a pickle file."""
    import os

    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        # best-model layouts: pointer-based (best/CURRENT -> vN/state, r3),
        # legacy flat (best/state), or the checkpoint dir itself
        best_dir = os.path.join(path, "best")
        cands = []
        ptr = os.path.join(best_dir, "CURRENT")
        if os.path.exists(ptr):
            with open(ptr) as f:
                cands.append(os.path.join(best_dir, f.read().strip(), "state"))
        cands += [os.path.join(best_dir, "state"), path]
        for cand in cands:
            if os.path.isdir(cand):
                restored = ocp.Checkpointer(ocp.StandardCheckpointHandler()).restore(cand)
                if isinstance(restored, dict) and "params" in restored:
                    return restored["params"]
                return restored
        raise FileNotFoundError(path)
    from ..checkpoint import load_pickle

    data = load_pickle(path)
    if isinstance(data, dict) and "state" in data:
        data = data["state"]
    return data.params if hasattr(data, "params") else data["params"]


class ClipFtRewardEngine(ClipRewardEngine):
    """Reward engine whose encoders are the fine-tuned multiscale adapter."""

    def __init__(
        self,
        adapter_params,
        clip_variables=None,
        clip_model_name: str = "vit_b16",
        batch_size: int = 256,
        use_crop: bool = False,
        image_size: int = 224,
        tokenizer=None,
        adapter: ClipMultiscaleAdapter | None = None,
    ):
        adapter = adapter or ClipMultiscaleAdapter(clip_model_name=clip_model_name)
        if clip_variables is None:
            clip_variables = load_model_vars(clip_model_name)
        self.adapter = adapter
        self.adapter_params = adapter_params
        self.model = adapter.clip_model if hasattr(adapter, "clip_model") else None
        self.variables = clip_variables
        self.batch_size = batch_size
        self.resize_mode = "fast"
        self.use_crop = use_crop
        self.image_size = image_size
        self.compute_dtype = jnp.float32
        self._tokenizer = tokenizer
        self._packed = False
        # base-class host_stage reads these (this __init__ bypasses super())
        self._host_resize = False
        self._dequantize = None

        @jax.jit
        def _encode_images(variables, frames, normalize):
            x = clip_preprocess(frames, image_size=image_size, resize_mode="fast", crop_half=use_crop)
            feat = adapter.apply(
                {"params": adapter_params}, variables, x, method=adapter.encode_image
            )
            # adapter features are already L2-normalized; "unnormalized" has no
            # meaning here, return the same features either way (reference
            # goal-conditioned path also uses these, label_reward.py:187-196)
            return feat

        @jax.jit
        def _encode_text(variables, tokens):
            return adapter.apply(
                {"params": adapter_params}, variables, tokens, method=adapter.encode_text
            )

        self._encode_images_jit = _encode_images
        self._encode_text_jit = _encode_text

    def text_rewards(self, frames, text):
        """logit_scale * (img @ text.T), averaged over texts (label_reward.py:200-230)."""
        return self.text_rewards_with_features(frames, self.encode_text_features(text))
