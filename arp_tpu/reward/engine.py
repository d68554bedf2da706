"""Batched on-device CLIP reward engine — the framework's north-star component.

Replaces the reference's reward computation (arp_dt/label_reward.py,
arp_dt/envs/vl_reward.py), which runs per-image PIL preprocessing on the host
and per-trajectory torch CLIP batches on a GPU.  Here the whole path is one
jitted TPU program per fixed-size batch:

    uint8 frames -> (pallas/XLA) resize+normalize -> ViT encode (MXU, bf16
    optional) -> logit-scale cosine rewards

with shape-bucketed compilation (pad-to-batch), async dispatch so host HDF5
reads overlap device compute, and both reward families:

  * text rewards:  ``logit_scale * cos(f_img, f_text)`` (mean over texts when
    several are given) — label_reward.py:132-146 semantics;
  * goal-conditioned: ``-||f_img - f_goal||_2`` on *unnormalized* features —
    label_reward.py:148-163 semantics.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..models import clip as clip_models
from ..ops.preprocess import clip_preprocess, clip_preprocess_packed_patches


def _finish_features(feat, normalize):
    """f32 features -> L2-normalized or raw per the traced `normalize` flag."""
    feat = feat.astype(jnp.float32)
    norm_feat = feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)
    return jnp.where(normalize, norm_feat, feat)


class ClipRewardEngine:
    """Streams uint8 frames through a jitted preprocess+encode+score pipeline.

    Args:
      model_name: key into arp_tpu.models.clip.MODELS (default CLIP ViT-B/16,
        the reference's reward model).
      variables: flax variables; if None, loaded via load_model_vars (requires
        a local checkpoint) — pass explicitly for tests.
      batch_size: fixed device batch; inputs are padded to multiples (one
        compilation, no shape churn).
      resize_mode: "pil" (bit-exact reference preprocessing, on device),
        "host" (same bit-exact resize on the host C++ thread pool, shipping
        only image_size^2 bytes over the link — best when transfer-bound),
        or "fast" (float bicubic, not bit-exact).
      compute_dtype: jnp.bfloat16 runs the encoder in bf16 on the MXU.
      mesh: optional ``jax.sharding.Mesh`` (parallel.mesh.create_mesh
        convention — axes dp/fsdp/tp/pp).  When given, each device batch is
        sharded over the data axes (dp, fsdp) and the weights are replicated,
        so one engine labels data-parallel across every chip of a slice —
        the pod-scale path for the north-star labeling component.  The jitted
        programs are unchanged; GSPMD partitions them from the input
        shardings alone.
    """

    def __init__(
        self,
        model_name: str = "vit_b16",
        variables=None,
        batch_size: int = 256,
        resize_mode: str = "pil",
        use_crop: bool = False,
        image_size: Optional[int] = None,
        compute_dtype=jnp.float32,
        tokenizer=None,
        model=None,
        quantize_weights=False,
        fast_encode: bool = False,
        fast_int8: bool = False,
        fast_score_bf16: Optional[bool] = None,
        fast_int8_attn: Optional[bool] = None,
        score_bf16: bool = False,
        mesh=None,
    ):
        self.model = model if model is not None else clip_models.MODELS[model_name]()
        if score_bf16 and (fast_encode or fast_int8):
            # score_bf16 reconfigures the FLAX model, which the packed fast
            # paths never run — silently inert; the packed knob is separate
            # because the two measured opposite on this chip.
            import warnings

            warnings.warn(
                "score_bf16 only affects the standard flax encode path and is "
                "inert under fast_encode/fast_int8 — use fast_score_bf16 for "
                "the packed paths",
                stacklevel=2,
            )
        if score_bf16:
            # bf16 attention scores/softmax on the STANDARD (flax model) path:
            # halves the (B, H, N, N) score HBM traffic.  Measured v5e: the
            # bf16 resident encode goes 2,949 -> 3,147 fps (+6.7%), overtaking
            # the int8 fast path (docs/BENCHMARKS.md).  NOTE the asymmetry:
            # on the PACKED fast paths the same idea (fast_score_bf16)
            # measures SLOWER than fp32 softmax on this chip — the two knobs
            # are deliberately separate, both chip-dependent.
            fields = getattr(type(self.model), "__dataclass_fields__", {})
            assert "score_dtype" in fields, (
                f"score_bf16 requires a model with a score_dtype field "
                f"(CLIP towers have one); got {type(self.model).__name__}"
            )
            self.model = self.model.clone(score_dtype=jnp.bfloat16)
        if variables is None:
            variables = clip_models.load_model_vars(model_name)
        self._dequantize = None
        if quantize_weights:
            # int8 weight-only storage: kernels live in HBM as int8 + scales
            # (4x less weight traffic / transfer than f32) and dequantize
            # inside the jitted program.
            from ..ops.quantization import quantize_tree

            variables, self._dequantize = quantize_tree(variables)
        self.variables = variables
        # lane alignment: the encoder pads every dispatch to batch_size, and
        # a non-64-multiple resident batch is ruinous on the 128-lane MXU
        # (measured v5e: B=48 collapses to 2,097 fps vs 4,778 at B=128 —
        # docs/BENCHMARKS.md §3b).  Rounding UP is free: the pad rows existed
        # anyway, results for real rows are unchanged, and total padded rows
        # can only shrink.  Tiny dev sizes (<32) are left alone.
        if batch_size >= 32 and batch_size % 64 != 0:
            aligned = -(-batch_size // 64) * 64
            import warnings

            warnings.warn(
                f"batch_size={batch_size} is lane-hostile on TPU (non-64-"
                f"multiple padding measured 2.3x slower); rounding up to "
                f"{aligned} — pass a multiple of 64 to silence",
                stacklevel=2,
            )
            batch_size = aligned
        self.batch_size = batch_size
        self.resize_mode = resize_mode
        self.use_crop = use_crop
        self.image_size = image_size or clip_models.IMAGE_RESOLUTION.get(model_name, 224)
        self.compute_dtype = compute_dtype
        self._tokenizer = tokenizer
        # machine-checkable numeric-path provenance (stamped onto labeled
        # datasets): the measured defaults of the packed knobs have flipped
        # between rounds, so "which recipe produced these rewards" must be
        # recorded on the artifact, not inferred from CLI flags
        self._recipe = (
            f"flax;{jnp.dtype(compute_dtype).name}"
            f";score={'bfloat16' if score_bf16 else 'float32'}"
            f";resize={resize_mode};crop={int(use_crop)};wq={int(quantize_weights)}"
        )

        model = self.model
        img_size = self.image_size
        # "host": bit-exact PIL resize runs on the HOST (C++ thread pool,
        # ops/preprocess.py::resize_bicubic_pil_host) in a producer thread
        # overlapped with device work, so only image_size^2 bytes cross the
        # host->device link.  The link is the measured bottleneck of this
        # pipeline (docs/BENCHMARKS.md bisect), so fewer bytes = more fps
        # whenever the link is slower than the host resize.
        self._host_resize = resize_mode == "host"
        # ViT towers use the packed-layout pipeline: the host hands frames as
        # (B, H, W*C) so no minor-dim-3 array ever exists on device (those
        # layouts pad 3 -> 128 lanes and dominate runtime), and the bit-exact
        # resize runs as MXU matmuls instead of gathers.
        self._packed = (
            (resize_mode == "pil" and not use_crop or self._host_resize)
            and getattr(model, "vision_patch_size", None) is not None
        )
        patch_size = getattr(model, "vision_patch_size", None)

        def _cast(variables, x):
            if compute_dtype != jnp.float32:
                x = x.astype(compute_dtype)
                variables = jax.tree_util.tree_map(
                    lambda p: p.astype(compute_dtype) if jnp.issubdtype(p.dtype, jnp.floating) else p,
                    variables,
                )
            return variables, x

        dequantize = self._dequantize

        @jax.jit
        def _encode_images(variables, frames, normalize):
            if dequantize is not None:
                variables = dequantize(variables)
            if self._packed:
                x = clip_preprocess_packed_patches(
                    frames, channels=3, image_size=img_size, patch_size=patch_size
                )
            else:
                # host mode arrives pre-resized/cropped: only normalize here
                dev_mode = "pil" if self._host_resize else resize_mode
                dev_crop = False if self._host_resize else use_crop
                x = clip_preprocess(
                    frames, image_size=img_size, resize_mode=dev_mode, crop_half=dev_crop
                )
            variables, x = _cast(variables, x)
            feat = model.apply(variables, x, normalize=False, method=model.encode_image)
            return _finish_features(feat, normalize)

        @jax.jit
        def _encode_text(variables, tokens):
            if dequantize is not None:
                variables = dequantize(variables)
            return model.apply(variables, tokens, normalize=True, method=model.encode_text)

        self._encode_images_jit = _encode_images
        self._encode_text_jit = _encode_text

        # --- packed fast encode path (ops/vit_infer.py) -----------------------
        # bf16 fused-QKV scan forward; optional static-int8 MXU matmuls
        # (calibrated lazily on the first batch).  Requires the packed-patch
        # pipeline (ViT tower + pil/host resize).
        self._fast = None
        self._fast_q = None
        self._fast_int8 = bool(fast_int8)
        self._needs_calib = False
        if (fast_encode or fast_int8) and self._packed:
            assert self._dequantize is None, (
                "fast_encode and quantize_weights are mutually exclusive: the "
                "fast path repacks raw kernels (int8 mode quantizes them itself)"
            )
            from ..ops import vit_infer

            heads = self.model.vision_features // 64
            # the bf16-vs-f32 choice follows compute_dtype, same as the
            # standard path (int8 calibration runs on the bf16 pack)
            fast_dtype = jnp.bfloat16 if fast_int8 else compute_dtype
            # bf16 attention scores/softmax halve the (B, H, N, N) HBM
            # traffic.  Round-4 interleaved stability series (docs/
            # BENCHMARKS.md): bf16 scores win on BOTH packed paths on this
            # v5e (int8 2,999 -> 3,192 fps; bf16 2,544 -> 2,720), reversing
            # the round-3 call — so None (default) resolves to bf16; pass
            # False for the fp32-softmax recipe.  Calibration keeps fp32
            # softmax: the ~1e-3 attention-output drift sits inside
            # quantize_packed's 1.05 amax margin.
            if fast_score_bf16 is None:
                fast_score_bf16 = True  # round-4 measured default
            score_dtype = jnp.bfloat16 if fast_score_bf16 else jnp.float32
            self._fast = vit_infer.pack_vit_params(
                variables, self.model.vision_num_layers, dtype=fast_dtype
            )
            self._needs_calib = bool(fast_int8)

            @jax.jit
            def _encode_fast(packed, frames, normalize):
                x = clip_preprocess_packed_patches(
                    frames, channels=3, image_size=img_size, patch_size=patch_size
                )
                return _finish_features(
                    vit_infer.vit_encode(
                        packed, x, heads, compute_dtype=fast_dtype, score_dtype=score_dtype
                    ),
                    normalize,
                )

            # w8a8 attention on top of the int8 body (int8 QK^T / P@V with
            # static scales).  Round-4 interleaved A/B on the v5e: wins at
            # every batch (b64 +8%, b128 4,146 -> 4,781 fps +15%, b256 +25%;
            # docs/BENCHMARKS.md) — so None (default) resolves to True under
            # fast_int8; pass False for the bf16-attention int8 recipe
            # (re-measure per chip via bench_encode_variants fast_int8_sm16_a8).
            if fast_int8_attn is None:
                fast_int8_attn = True  # round-4 measured default
            int8_attn = bool(fast_int8_attn) and bool(fast_int8)
            self._recipe = (
                f"packed;{'int8' if fast_int8 else jnp.dtype(fast_dtype).name}"
                f";score={jnp.dtype(score_dtype).name};int8_attn={int(int8_attn)}"
                f";resize={resize_mode};crop={int(use_crop)}"
            )

            @jax.jit
            def _encode_fast_int8(qpacked, frames, normalize):
                x = clip_preprocess_packed_patches(
                    frames, channels=3, image_size=img_size, patch_size=patch_size
                )
                return _finish_features(
                    vit_infer.vit_encode_int8(
                        qpacked, x, heads, score_dtype=score_dtype, int8_attn=int8_attn
                    ),
                    normalize,
                )

            @jax.jit
            def _calibrate(packed, frames):
                x = clip_preprocess_packed_patches(
                    frames, channels=3, image_size=img_size, patch_size=patch_size
                )
                return vit_infer.calibrate_vit(packed, x, heads)

            self._encode_fast_jit = _encode_fast
            self._encode_fast_int8_jit = _encode_fast_int8
            self._calibrate_jit = _calibrate
        elif fast_encode or fast_int8:
            import warnings

            warnings.warn(
                "fast_encode requires the packed ViT pipeline (ViT tower + "
                "pil/host resize, no engine-side crop); using the standard path"
            )
            self._fast_int8 = False

        self._init_mesh(mesh)

    def _init_mesh(self, mesh) -> None:
        """Optional GSPMD data parallelism for the encode batches.

        Shards every device batch's leading dim over the mesh's data axes
        (dp, fsdp) and replicates the weights; jit then partitions the
        existing encode programs across all chips from the input shardings
        alone — no separate multi-chip code path.  Single-process scope: for
        multi-host labeling shard *files* across hosts (each with its own
        engine over the local mesh), not batches.
        """
        self.mesh = mesh
        self._frames_sharding = None
        if mesh is None:
            return
        assert jax.process_count() == 1, (
            "engine mesh sharding device_puts host batches, which needs every "
            "mesh device addressable; under multi-host shard the file per host "
            "(reward/labeler.py --num_hosts/--host_index + --merge)"
        )
        from ..parallel.mesh import batch_sharding, replicated

        n_data = int(mesh.shape.get("dp", 1)) * int(mesh.shape.get("fsdp", 1))
        assert self.batch_size % max(n_data, 1) == 0, (
            f"batch_size={self.batch_size} must be divisible by the mesh "
            f"data parallelism dp*fsdp={n_data}"
        )
        # packed pipeline hands (B, H, W*C); otherwise (B, H, W, C)
        self._frames_sharding = batch_sharding(mesh, ndim=3 if self._packed else 4)
        self._replicated_sharding = replicated(mesh)
        self.variables = jax.device_put(self.variables, self._replicated_sharding)
        if getattr(self, "_fast", None) is not None:
            self._fast = jax.device_put(self._fast, self._replicated_sharding)

    def _put_chunk(self, chunk):
        """Host chunk -> device, sharded over the mesh data axes if present."""
        if getattr(self, "_frames_sharding", None) is not None:
            return jax.device_put(chunk, self._frames_sharding)
        return jax.device_put(chunk)

    def _encode_chunk(self, chunk_dev, normalize):
        """Dispatch one device batch to the selected encode implementation."""
        # getattr: subclasses (ClipFtRewardEngine) build their own pipelines
        # and never initialize the fast-path attributes
        if getattr(self, "_fast", None) is not None:
            if self._needs_calib:
                import numpy as _np

                from ..ops import vit_infer

                amax = jax.tree_util.tree_map(
                    _np.asarray, self._calibrate_jit(self._fast, chunk_dev)
                )
                self._fast_q = vit_infer.quantize_packed(self._fast, amax)
                if getattr(self, "_frames_sharding", None) is not None:
                    self._fast_q = jax.device_put(self._fast_q, self._replicated_sharding)
                self._needs_calib = False
            if self._fast_int8:
                return self._encode_fast_int8_jit(self._fast_q, chunk_dev, normalize)
            return self._encode_fast_jit(self._fast, chunk_dev, normalize)
        return self._encode_images_jit(self.variables, chunk_dev, normalize)

    # -- engine spec (self-contained save/load) -------------------------------

    # CLIP constructor fields a saved spec records (everything needed to
    # rebuild the module; perf knobs like score_dtype stay engine kwargs)
    _SPEC_FIELDS = (
        "vocab_size", "embed_dim", "text_features", "text_num_layers",
        "text_num_heads", "vision_features", "vision_num_layers",
        "vision_patch_size",
    )

    def save_npz(self, path: str):
        """Write a self-contained engine spec: CLIP config + variables +
        tokenizer tag + image size, loadable with :meth:`from_npz`.

        The use case is reward models whose weights are not the stock OpenAI
        checkpoints — a trained tiny CLIP (stub benchmark), a from-scratch
        or distilled tower — handed to the eval CLIs via ``--vl_checkpoint
        foo.npz`` so online rtg rewards match the training labels.
        """
        import json

        import flax

        cfg = {k: getattr(self.model, k) for k in self._SPEC_FIELDS}
        if isinstance(cfg["vision_num_layers"], (tuple, list)):
            cfg["vision_num_layers"] = list(cfg["vision_num_layers"])
        flat = {
            "/".join(k): np.asarray(v)
            for k, v in flax.traverse_util.flatten_dict(
                jax.device_get(self.variables)).items()
        }
        meta = {
            "clip_config": cfg,
            "tokenizer": self.tokenizer_identity,
            "image_size": self.image_size,
        }
        np.savez_compressed(path, __meta__=np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8), **flat)

    @classmethod
    def from_npz(cls, path: str, **engine_kwargs):
        """Rebuild an engine from a :meth:`save_npz` spec.

        ``engine_kwargs`` override runtime knobs (batch_size, resize_mode,
        compute_dtype, ...); the model config, weights, tokenizer, and
        image size come from the file.
        """
        import json

        import flax

        from ..models.clip.model import CLIP

        with np.load(path) as z:
            meta = json.loads(bytes(z["__meta__"]).decode())
            flat = {tuple(k.split("/")): z[k] for k in z.files if k != "__meta__"}
        variables = flax.traverse_util.unflatten_dict(flat)
        cfg = meta["clip_config"]
        if isinstance(cfg["vision_num_layers"], list):
            cfg["vision_num_layers"] = tuple(cfg["vision_num_layers"])
        tokenizer = None
        if meta["tokenizer"] == "char97":
            from ..models.clip.tokenizer import Char97Tokenizer

            tokenizer = Char97Tokenizer()
        # "bpe:<sha16>"/"fallback"/"custom": leave None -> the engine lazily
        # builds the standard BPE tokenizer (same vocab given the merges file)
        engine_kwargs.setdefault("image_size", meta["image_size"])
        return cls(model=CLIP(**cfg), variables=variables,
                   tokenizer=tokenizer, **engine_kwargs)

    # -- tokenization ---------------------------------------------------------

    @property
    def tokenizer(self):
        if self._tokenizer is None:
            self._tokenizer = clip_models.build_tokenizer(truncate=True)
        return self._tokenizer

    def tokenize(self, text: Union[str, Sequence[str]]) -> np.ndarray:
        return np.asarray(self.tokenizer(text))

    @property
    def tokenizer_identity(self) -> str:
        """Provenance string for labeled outputs: "bpe:<sha16>" with the real
        merges file, "fallback" under the byte-level fallback vocab, "custom"
        for injected tokenizers without identity metadata."""
        tok = getattr(self.tokenizer, "tokenizer", None)
        return getattr(tok, "identity", None) or "custom"

    @property
    def encode_recipe(self) -> str:
        """Provenance string for the numeric path that produces rewards:
        compute path (flax/packed), dtype/int8, score dtype, int8_attn,
        resize mode, crop.  Stamped onto labeled datasets so reward
        provenance stays machine-checkable across measured-default flips
        (e.g. fast_score_bf16/int8_attn None -> True in round 4)."""
        return self._recipe

    # -- feature extraction ---------------------------------------------------

    def _batched_image_features(self, frames: np.ndarray, normalize: bool) -> np.ndarray:
        """Encode (N, H, W, C) uint8 frames in fixed-size padded batches.

        Dispatches all device batches before blocking on results, so the
        host->device transfer and HDF5 reads of batch k+1 overlap the encode
        of batch k (jax async dispatch).
        """
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        from ..ops.preprocess import center_crop_np, resize_bicubic_pil_host

        n = frames.shape[0]
        bs = self.batch_size

        def host_stage(start: int) -> np.ndarray:
            chunk = np.asarray(frames[start : start + bs])
            if chunk.shape[0] < bs:
                pad = np.repeat(chunk[-1:], bs - chunk.shape[0], axis=0)
                chunk = np.concatenate([chunk, pad], axis=0)
            if self._host_resize:
                if self.use_crop:
                    chunk = center_crop_np(chunk, chunk.shape[1] // 2, chunk.shape[2] // 2)
                if chunk.shape[1:3] != (self.image_size, self.image_size):
                    chunk = resize_bicubic_pil_host(chunk, self.image_size, self.image_size)
            if self._packed:
                # free host-side view: (B, H, W, C) -> (B, H, W*C)
                chunk = np.ascontiguousarray(chunk).reshape(bs, chunk.shape[1], -1)
            return chunk

        # Producer thread prepares chunk k+1/k+2 (HDF5 slice + optional C++
        # resize, GIL-free) while chunk k transfers and encodes; explicit
        # async device_put because implicit dispatch-time transfers of >2-D
        # arrays are ~6x slower on some backends.
        outputs = []
        starts = list(range(0, n, bs))
        with ThreadPoolExecutor(max_workers=1) as pool:
            pending = deque(pool.submit(host_stage, s) for s in starts[:2])
            for k in range(len(starts)):
                if k + 2 < len(starts):
                    pending.append(pool.submit(host_stage, starts[k + 2]))
                chunk = pending.popleft().result()
                outputs.append(self._encode_chunk(self._put_chunk(chunk), normalize))
        feats = np.concatenate([np.asarray(o) for o in outputs], axis=0)
        return feats[:n]

    def encode_image_features(self, frames: np.ndarray, normalize: bool = True) -> np.ndarray:
        """Public batched image-feature extraction (streaming, padded batches)."""
        return self._batched_image_features(frames, normalize=normalize)

    def encode_text_features(self, text: Union[str, Sequence[str], np.ndarray]) -> np.ndarray:
        if isinstance(text, (str, list, tuple)):
            tokens = self.tokenize(text)
        else:
            tokens = np.asarray(text)
        return np.asarray(self._encode_text_jit(self.variables, tokens))

    # -- rewards --------------------------------------------------------------

    def text_rewards_with_features(self, frames: np.ndarray, txt_feat: np.ndarray) -> np.ndarray:
        """Text rewards against precomputed (normalized) text features —
        lets callers amortize text encoding across many steps (rollout eval)."""
        img_feat = self._batched_image_features(frames, normalize=True)
        logit_scale = float(np.exp(np.asarray(self.variables["params"]["logit_scale"])))
        logits_per_text = logit_scale * (txt_feat @ img_feat.T)  # (n_text, N)
        if logits_per_text.shape[0] > 1:
            return logits_per_text.mean(axis=0)
        return logits_per_text[0]

    def text_rewards(self, frames: np.ndarray, text: Union[str, Sequence[str], np.ndarray]) -> np.ndarray:
        """logit_scale * cosine(image, text); averaged over multiple texts."""
        return self.text_rewards_with_features(frames, self.encode_text_features(text))

    def goal_rewards_with_features(self, frames: np.ndarray, goal_feat: np.ndarray) -> np.ndarray:
        """-||f(img) - f(goal)||_2 against precomputed unnormalized goal
        features ((D,) shared or (N, D) per-frame)."""
        feats = self._batched_image_features(frames, normalize=False)
        return -np.linalg.norm(feats - np.atleast_2d(goal_feat), axis=-1)

    def goal_rewards(self, frames: np.ndarray, goal_index: int = -1) -> np.ndarray:
        """-||f(img) - f(goal)||_2 on unnormalized features; the goal is the
        frame at ``goal_index`` within ``frames`` (reference uses the last
        frame of each trajectory, label_reward.py:159)."""
        feats = self._batched_image_features(frames, normalize=False)
        goal = feats[goal_index]
        return -np.linalg.norm(feats - goal[None], axis=-1)

    def goal_rewards_vs(self, frames: np.ndarray, goal_frame: np.ndarray) -> np.ndarray:
        """Goal rewards against an explicit goal image (online eval variant)."""
        goal = self._batched_image_features(goal_frame[None], normalize=False)[0]
        return self.goal_rewards_with_features(frames, goal)
