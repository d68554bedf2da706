"""clip_ft reward engine: labeling/eval with the fine-tuned adapter.

Gives the ``model_type=clip_ft`` path for arp_tpu.reward.labeler and the
``vl_type=clip_ft`` path for rollout eval (reference: label_reward.py:165-230,
envs/vl_reward.py:44-79), using the JAX adapter instead of torch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.clip import load_model_vars
from ..models.clip.model import CONFIGS
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
        fast_encode: bool = False,
        fast_int8: bool = False,
        fast_score_bf16: bool | None = None,
        fast_int8_attn: bool | None = None,
        clip_config: dict | None = None,
        mesh=None,
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

        # --- packed fast trunk (ops/vit_infer.py): the CLIP forward (the
        # dominant cost) runs repacked/fused (optionally static-int8); the
        # adapter head reuses its single flax implementation
        # (adapt_image_features).  Text stays on the standard path (tiny).
        self._fast = None
        self._fast_q = None
        self._fast_int8 = bool(fast_int8)
        self._needs_calib = False
        cfg = clip_config or CONFIGS[clip_model_name]
        if (fast_encode or fast_int8) and cfg.get("vision_patch_size") is not None:
            from ..models.m3ae import extract_patches
            from ..ops import vit_infer
            from ..ops.preprocess import clip_preprocess as _pre
            heads = cfg["vision_features"] // 64
            patch = cfg["vision_patch_size"]
            # bf16 softmax scores: see ClipRewardEngine (same measured
            # default: None -> bf16 on the packed paths, round-4 series)
            if fast_score_bf16 is None:
                fast_score_bf16 = True
            score_dtype = jnp.bfloat16 if fast_score_bf16 else jnp.float32
            n_layers_used = cfg["text_num_layers"]  # adapter quirk, see model
            self._fast = vit_infer.pack_vit_params(clip_variables, cfg["vision_num_layers"])
            self._needs_calib = bool(fast_int8)

            def _patchify(frames):
                x = _pre(frames, image_size=image_size, resize_mode="fast", crop_half=use_crop)
                return extract_patches(x, patch)

            def _adapt(final, inter):
                # (L, B, D) layer-ordered CLS tokens -> (B, L*D), same concat
                # order as the flax capture_intermediates path
                inter = inter[:n_layers_used]
                cls_cat = jnp.transpose(inter, (1, 0, 2)).reshape(inter.shape[1], -1)
                return adapter.apply(
                    {"params": adapter_params},
                    cls_cat,
                    final,
                    method=adapter.adapt_image_features,
                )

            @jax.jit
            def _encode_fast(packed, frames, normalize):
                final, inter = vit_infer.vit_encode(
                    packed, _patchify(frames), heads, return_intermediates=True,
                    score_dtype=score_dtype,
                )
                return _adapt(final, inter)

            # round-4 measured default: w8a8 attention wins at every batch on
            # the v5e (see ClipRewardEngine); None resolves to True under int8
            if fast_int8_attn is None:
                fast_int8_attn = True
            int8_attn = bool(fast_int8_attn) and bool(fast_int8)

            @jax.jit
            def _encode_fast_int8(qpacked, frames, normalize):
                final, inter = vit_infer.vit_encode_int8(
                    qpacked, _patchify(frames), heads, return_intermediates=True,
                    score_dtype=score_dtype, int8_attn=int8_attn,
                )
                return _adapt(final, inter)

            @jax.jit
            def _calibrate(packed, frames):
                return vit_infer.calibrate_vit(packed, _patchify(frames), heads)

            self._encode_fast_jit = _encode_fast
            self._encode_fast_int8_jit = _encode_fast_int8
            self._calibrate_jit = _calibrate

        # adapter_params are closed over in the jits (GSPMD replicates
        # captured constants); only self.variables/_fast need the explicit put
        self._init_mesh(mesh)

    def text_rewards(self, frames, text):
        """logit_scale * (img @ text.T), averaged over texts (label_reward.py:200-230)."""
        return self.text_rewards_with_features(frames, self.encode_text_features(text))
