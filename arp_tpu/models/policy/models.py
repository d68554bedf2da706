"""Policy models: ARPDT (reward-conditioned DT), BC / InstructRL, GCBC.

One shared implementation (the reference triplicates ~1.7k LoC across
arp_dt/ARPDT.py, BC.py, GCBC.py; the only real differences are the token
layout and the goal/rtg conditioning).  Token streams per timestep:

    ARPDT:  [obs_tokens..., (state), rtg, action]     (ARPDT.py:156-172)
    BC:     [obs_tokens..., (state), action]          (BC.py:135-147)
    GCBC:   [obs_tokens..., (state), action]  with goal-joint obs encoding
                                                      (GCBC.py:445-496)

TPU-first details:
  * the causal+intra-step-obs mask is a lazy MaskSpec evaluated in the fused
    attention op — the reference builds (n, n) numpy/scipy masks per call
    (ARPDT.py:175-200);
  * ensemble action/return heads run as ONE vmapped batched matmul on the MXU
    instead of a python loop of 5 small Denses (ARPDT.py:210-222);
  * frozen-encoder forwards (CLIP / M3AE) are jit-inlined and can be
    bf16-cast; stop_gradient placement matches the reference exactly.

Size presets: the reference's ``get_transformer_by_config`` never fires for
CLI-configured runs (it is evaluated before flag updates are applied,
ARPDT.py:60-64), so names like "vit_base" only select the DT block mask and
dims come from the explicit config (default 128/2/8).  Here presets apply
post-update when the name is in the preset table, and "vit*" names keep
explicit dims — strictly compatible with how the reference actually runs.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from ml_collections import ConfigDict
from ml_collections.config_dict import config_dict

from ...config import update_config
from ...ops.masks import MaskSpec
from ...utils import get_1d_sincos_pos_embed, get_2d_sincos_pos_embed, symexp, symlog
from .. import m3ae as m3ae_lib
from ..clip import model as clip_lib
from ..impala import ImpalaCNN
from ..layers import AdapterMLP, PipelinedTransformer, Transformer, resolve_compute_dtype

# text vocab of bert-base-uncased; constant to avoid a tokenizer download
# (reference queries transformers.BertTokenizer at module init, ARPDT.py:138)
BERT_VOCAB_SIZE = 30522

_SIZE_PRESETS = {
    "tiny": dict(emb_dim=128, depth=4, num_heads=8),
    "small": dict(emb_dim=512, depth=4, num_heads=8),
    "base": dict(emb_dim=768, depth=6, num_heads=12),
    "medium": dict(emb_dim=1280, depth=10, num_heads=20),
    "large": dict(emb_dim=1280, depth=14, num_heads=20),
    "huge": dict(emb_dim=1280, depth=18, num_heads=16),
    "debug": dict(emb_dim=16, depth=2, num_heads=2, mlp_ratio=2),
}
_WIDTH_SUFFIXES = {"l": 2560, "xl": 5120}


def apply_size_preset(model_type: str, config: ConfigDict) -> None:
    if model_type in _SIZE_PRESETS:
        for k, v in _SIZE_PRESETS[model_type].items():
            setattr(config, k, v)
        return
    for base_name, preset in _SIZE_PRESETS.items():
        if model_type.startswith(base_name):
            suffix = model_type[len(base_name):]
            if suffix in _WIDTH_SUFFIXES:
                for k, v in preset.items():
                    setattr(config, k, v)
                config.emb_dim = _WIDTH_SUFFIXES[suffix]
                return
    # unknown names (e.g. "vit_base") keep explicit dims — see module docstring


def _resolve_compute_dtype(cfg) -> Any:
    return resolve_compute_dtype(cfg.get("compute_dtype", "float32"))


def get_policy_default_config(updates=None) -> ConfigDict:
    """Shared policy config (reference: ARPDT.get_default_config, ARPDT.py:27-66)."""
    config = ConfigDict()
    config.model_type = config_dict.placeholder(str)
    config.transfer_type = "none"
    config.alibi_bias = False
    config.att_drop = 0.0
    config.drop = 0.0
    config.mlp_ratio = 4
    config.emb_dim = 128
    config.depth = 2
    config.num_heads = 8
    config.use_discrete_action = False
    config.use_text = False

    config.use_adapter = False
    config.use_from_scratch = False
    config.use_impala_backbone = False
    config.clip_checkpoint_path = "none"

    config.use_intermediate = False
    config.num_ensembles = 5

    # pipeline parallelism over the policy block stack (parallel/pipeline.py);
    # >1 requires the model to be built with a mesh carrying a pp axis
    config.pp_stages = 1
    config.pp_microbatches = 4

    # rematerialize policy blocks on backward (jax.checkpoint) — HBM for FLOPs
    config.remat = False
    # "float32" | "bfloat16": matmul dtype for the policy blocks (fp32
    # layernorms/softmax/residuals; params stay fp32 — see models/layers.py)
    config.compute_dtype = "float32"

    # run every FROZEN pretrained tower (clip / mae / m3ae) with the reward
    # engine's full-bf16 inference recipe: param tree cast to bf16 once,
    # bf16 layernorms + residual stream (fp32 attention softmax stays).
    # Measured on a v5e this is the single biggest train-step lever: the
    # frozen m3ae forward dominates the flagship step and runs ~33% faster
    # full-bf16 than fp32 (scripts/bench_m3ae_dtype.py) — while the trained
    # policy blocks stay at full precision, so optimizer numerics are
    # unchanged; only the (frozen, stop_gradient) embeddings move by bf16
    # rounding. Incompatible with use_from_scratch (the encoder trains there).
    config.frozen_bf16 = False
    # attention score/softmax dtype on the frozen towers under frozen_bf16.
    # "bfloat16" halves the (B, H, 257, 257) score-tensor HBM traffic — the
    # largest byte term of the bandwidth-bound flagship step; measured on a
    # v5e it takes the step from 979 to 1,386 frames/s (+41%,
    # scripts/bench_train.py frozen_bf16 vs frozen_sm16) with encoder-only
    # parity cosine >0.99. Set "float32" to keep the standard softmax recipe
    # (chip-dependent — re-measure on other TPU generations).
    config.frozen_score_dtype = "bfloat16"
    # run the frozen m3ae/mae tower through the PACKED int8 fast forward
    # (ops/m3ae_infer.py): per-output-channel int8 weights, static activation
    # scales calibrated once on real frames, quantization fused into the
    # LN/GELU epilogues.  Implies frozen_bf16 (the non-matmul recipe is the
    # same).  Requires a calibrated pack on the model (``frozen_qpack`` —
    # build it with build_frozen_qpack(); the trainer does this automatically
    # from its first batch).  Matches the reference's in-step encode
    # semantics (ARPDT.py:338,451-458) with int8 matmul numerics.
    config.frozen_int8 = False
    # additionally run the frozen tower's two attention matmuls w8a8
    # (ops/vit_infer.py::_attention_int8): int8 QK^T and P@V with static
    # scales — halves the probability-tensor HBM traffic on top of
    # frozen_int8.  Round-4 measured on the v5e: flagship step 118 -> 86
    # ms (+36%, bench_train frozen_int8_sm16 vs _a8), resident encode +15%
    # (docs/BENCHMARKS.md).  "auto" (default) resolves to True under
    # frozen_int8 and False otherwise; set "true" to force it (implies
    # frozen_int8) or "false" for the bf16-attention int8 recipe.
    config.frozen_int8_attn = "auto"

    config.lambda_return_pred = 1.0
    config.use_symlog = False

    config.mae = m3ae_lib.MaskedAutoencoder.get_default_config()
    config.mae.use_type_embedding = False
    config.m3ae = m3ae_lib.MaskedMultimodalAutoencoder.get_default_config()

    update_config(config, updates)
    if config.model_type is not None:
        apply_size_preset(config.model_type, config)
    attn = str(config.frozen_int8_attn).lower()
    assert attn in ("auto", "true", "false", "1", "0"), config.frozen_int8_attn
    if attn in ("true", "1"):
        config.frozen_int8 = True  # explicit w8a8 rides on the int8 pack
    elif attn == "auto":
        attn = "true" if config.frozen_int8 else "false"
    config.frozen_int8_attn = "true" if attn in ("true", "1") else "false"
    if config.frozen_int8:
        # int8 matmuls ride on the frozen_bf16 recipe (bf16 LNs/residuals +
        # the measured score dtype); turning it on implies the full recipe
        config.frozen_bf16 = True
    # --model.remat / --model.compute_dtype cover the whole model: propagate
    # to the frozen-encoder sub-configs (the m3ae/mae encoder dominates both
    # compute and activations under the flagship policy) unless the
    # sub-config was set explicitly (a non-default sub value wins).
    for sub_name in ("mae", "m3ae"):
        sub = config[sub_name]
        if config.remat and not sub.get("remat", False):
            sub.remat = True
        if (
            config.compute_dtype != "float32"
            and sub.get("compute_dtype", "float32") == "float32"
        ):
            sub.compute_dtype = config.compute_dtype
        if config.frozen_bf16:
            # full-cast recipe on the frozen encoder: bf16 matmuls AND bf16
            # layernorms/residuals (the param-tree cast happens at apply time,
            # models.py::BasePolicy._frozen_m3ae_apply) + the measured
            # score/softmax dtype (frozen_score_dtype above). An explicitly
            # set sub-config score_dtype wins, mirroring the compute_dtype
            # explicit-wins guard above.
            sub.compute_dtype = "bfloat16"
            sub.ln_dtype = "bfloat16"
            if sub.get("score_dtype", "float32") == "float32":
                sub.score_dtype = config.frozen_score_dtype
    if config.frozen_bf16:
        assert not config.use_from_scratch, (
            "frozen_bf16 is an inference recipe for FROZEN pretrained towers; "
            "with use_from_scratch the encoder trains and must keep the "
            "standard mixed-precision recipe (use --model.compute_dtype)"
        )
    return config


def cross_entropy(logits, labels, num_classes):
    acc = jnp.mean(jnp.argmax(logits, axis=-1) == labels)
    onehot = jax.nn.one_hot(labels, num_classes)
    loss = jnp.mean(-onehot * jax.nn.log_softmax(logits))
    return loss, acc


def mse_loss(val, target):
    return jnp.mean(jnp.square(val - target))


class _Head(nn.Module):
    hidden_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim)(x)
        x = nn.relu(x)
        return nn.Dense(self.out_dim, use_bias=False)(x)


class EnsembleHeads(nn.Module):
    """N independent MLP heads, averaged — one vmapped MXU matmul.

    Equivalent to the reference's list of Sequential heads (ARPDT.py:94-99)
    but executed as a single batched program.
    """

    num_ensembles: int
    hidden_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x):
        heads = nn.vmap(
            _Head,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=None,
            out_axes=0,
            axis_size=self.num_ensembles,
        )(self.hidden_dim, self.out_dim, name="heads")
        return heads(x).mean(axis=0)


class BasePolicy(nn.Module):
    """Common skeleton; subclasses set `use_rtg` / `use_goal` class attrs."""

    config_updates: Any = None
    num_actions: Optional[int] = None
    patch_dim: Optional[int] = None
    normalize_quterion: bool = False

    use_rtg: bool = False   # ARPDT
    use_goal: bool = False  # GCBC
    resize_clip_input: bool = False  # BC/GCBC resize to 224 in-model (BC.py:259)
    mesh: Any = None        # required when config.pp_stages > 1
    # calibrated int8 pack for the frozen m3ae/mae tower (config.frozen_int8);
    # build with :func:`build_frozen_qpack` — the trainer does it from its
    # first batch. Derived from the frozen pt_params, never checkpointed.
    frozen_qpack: Any = None

    @staticmethod
    @nn.nowrap
    def get_default_config(updates=None):
        return get_policy_default_config(updates)

    @nn.nowrap
    def rng_keys(self):
        return ("params", "noise", "dropout")

    @nn.nowrap
    def no_decay_list(self):
        return []

    def setup(self):
        self.config = self.get_default_config(self.config_updates)
        cfg = self.config
        if self.use_goal and not (
            cfg.transfer_type.startswith("m3ae") or cfg.transfer_type.endswith("_cached")
        ):
            import warnings

            warnings.warn(
                f"GCBC with transfer_type={cfg.transfer_type!r} does NOT "
                "consume the goal frame (reference parity: GCBC.py's none/"
                "clip branches ignore batch['goal']; only the m3ae joint "
                "encode and the cached-embedding path condition on goals) — "
                "this configuration trains as plain BC.",
                stacklevel=2,
            )
        # frozen_bf16 threads the measured score/softmax dtype into the frozen
        # CLIP tower too (the m3ae/mae towers get it via their sub-configs in
        # get_policy_default_config); CLIP's attention carries its own
        # score_dtype knob, so the param cast in _frozen_clip_apply plus this
        # covers the full recipe on every frozen tower.
        clip_kwargs = (
            {"score_dtype": resolve_compute_dtype(cfg.frozen_score_dtype)}
            if cfg.get("frozen_bf16", False)
            else {}
        )

        if cfg.get("pp_stages", 1) > 1:
            assert cfg.att_drop == 0.0 and cfg.drop == 0.0, (
                "pipeline-parallel policy requires dropout disabled (rng "
                "plumbing through the pp region would change update parity)"
            )
            self.policy = PipelinedTransformer(
                emb_dim=cfg.emb_dim,
                depth=cfg.depth,
                num_heads=cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio,
                alibi_bias=cfg.alibi_bias,
                stages=cfg.pp_stages,
                microbatches=cfg.pp_microbatches,
                mesh=self.mesh,
                remat=cfg.get("remat", False),
                compute_dtype=_resolve_compute_dtype(cfg),
                name="policy",
            )
        else:
            self.policy = Transformer(
                emb_dim=cfg.emb_dim,
                depth=cfg.depth,
                att_drop=cfg.att_drop,
                drop=cfg.drop,
                num_heads=cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio,
                alibi_bias=cfg.alibi_bias,
                remat=cfg.get("remat", False),
                compute_dtype=_resolve_compute_dtype(cfg),
                name="policy",
            )
        self.action_outputs = EnsembleHeads(cfg.num_ensembles, cfg.emb_dim, self.num_actions)
        if self.use_rtg:
            self.return_outputs = EnsembleHeads(cfg.num_ensembles, cfg.emb_dim, 1)

        if cfg.use_discrete_action:
            assert self.num_actions == 15, "15 discrete actions for Procgen benchmark."
            self.action_input = nn.Embed(num_embeddings=self.num_actions, features=cfg.emb_dim)
        else:
            self.action_input = nn.Dense(cfg.emb_dim, use_bias=False)
        self.state_input = nn.Dense(cfg.emb_dim, use_bias=False)
        if self.use_rtg:
            self.rtg_input = nn.Dense(cfg.emb_dim, use_bias=False)

        transfer_type = cfg.transfer_type
        if transfer_type.endswith("_cached"):
            # precomputed frozen-encoder embeddings (data/cache_embeddings.py):
            # no encoder lives in the model; text conditioning still loads the
            # CLIP text tower when use_text is set.  GCBC consumes per-step
            # hindsight-goal embeddings from the same cache (batch
            # ``goal_emb``) — NOTE this is separate-encode conditioning
            # (obs emb ++ goal emb), not the live m3ae path's joint
            # (obs, goal) encode, which cannot be cached per frame; same
            # conditioning information, different function class (docs/
            # ARCHITECTURE.md cached-embeddings section).
            assert not (cfg.use_text and not transfer_type.startswith("clip")), (
                f"use_text with {transfer_type}: cached mode has no live text "
                "tower for non-CLIP encoders — cache text embeddings or use "
                "the live encoder path"
            )
            if cfg.use_text and transfer_type.startswith("clip"):
                model_name = transfer_type[len("clip_"):-len("_cached")]
                self.pt_model = clip_lib.MODELS[model_name](**clip_kwargs)
                if not cfg.use_from_scratch:
                    self.pt_params = clip_lib.load_model_vars(model_name)
            self.image_text_input = nn.Dense(cfg.emb_dim)
        elif transfer_type == "none":
            self.patch_emb = nn.Dense(cfg.emb_dim)
        elif transfer_type.startswith("clip"):
            model_name = transfer_type.split("_", 1)[1]
            self.pt_model = clip_lib.MODELS[model_name](**clip_kwargs)
            if not cfg.use_from_scratch:
                checkpoint_path = None if cfg.clip_checkpoint_path == "none" else cfg.clip_checkpoint_path
                self.pt_params = clip_lib.load_model_vars(model_name, checkpoint_path=checkpoint_path)
            if cfg.use_impala_backbone:
                self.impala = ImpalaCNN()
            self.image_text_input = nn.Dense(cfg.emb_dim)
        elif transfer_type.startswith("mae"):
            model_name = transfer_type.split("_", 1)[1]
            self.pt_model = m3ae_lib.MaskedAutoencoder(cfg.mae)
            if not cfg.use_from_scratch:
                self.pt_params = m3ae_lib.load_m3ae_model_vars(model_name)
            self.image_text_input = nn.Dense(cfg.emb_dim)
        elif transfer_type.startswith("m3ae"):
            self.pt_model = m3ae_lib.MaskedMultimodalAutoencoder(cfg.m3ae, text_vocab_size=BERT_VOCAB_SIZE)
            if not cfg.use_from_scratch:
                model_name = transfer_type.split("_", 1)[1]
                self.pt_params = m3ae_lib.load_m3ae_model_vars(model_name)
            self.image_text_input = nn.Dense(cfg.emb_dim)
        else:
            raise ValueError("Unsupported transfer type!")

        if cfg.use_adapter:
            self.residual_weight = self.param("residual_weight", nn.initializers.constant(4.0), (1,))

    # -- helpers --------------------------------------------------------------

    def patchify(self, x):
        # single home for the layout-critical (p_row, p_col, channel) patch
        # transform that converted checkpoints assume
        from ..m3ae import extract_patches

        return extract_patches(x, self.patch_dim)

    def _apply_adapter(self, *embs):
        """Gated adapter on one or more same-width embeddings; multiple
        arrays share ONE adapter module (cached GCBC runs obs and goal
        halves through the same params — one frozen-encoder output space)."""
        adapter = AdapterMLP(hidden_dim=embs[0].shape[-1], output_dim=embs[0].shape[-1], num_layers=2)
        res = nn.sigmoid(self.residual_weight)
        out = tuple(res * adapter(e) + (1 - res) * e for e in embs)
        return out[0] if len(out) == 1 else out

    def _frozen_clip_apply(self, method, x):
        """Run the frozen CLIP tower, honoring ``compute_dtype`` /
        ``frozen_bf16``: bf16 casts the (constant-folded) variables and any
        float input, fp32 comes back out — the reward engine's recipe
        (reward/engine.py::_cast) applied to the policy path. (The CLIP tower
        is dtype-polymorphic, so the variable cast alone gives bf16 LNs.)"""
        dt = _resolve_compute_dtype(self.config)
        if self.config.get("frozen_bf16", False):
            dt = jnp.bfloat16
        variables = self.pt_params
        if dt is not None:
            variables = jax.tree_util.tree_map(
                lambda p: p.astype(dt) if jnp.issubdtype(p.dtype, jnp.floating) else p,
                variables,
            )
            if jnp.issubdtype(x.dtype, jnp.floating):
                x = x.astype(dt)
        out = self.pt_model.apply(variables, x, method=method)
        return out.astype(jnp.float32) if dt is not None else out

    def _frozen_m3ae_params(self):
        """The frozen m3ae/mae param tree, cast to bf16 once under
        ``frozen_bf16`` (weights are HBM-read every matmul; storing them
        half-width pairs with the bf16-LN recipe the sub-config carries)."""
        if not self.config.get("frozen_bf16", False):
            return self.pt_params
        return jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16) if jnp.issubdtype(p.dtype, jnp.floating) else p,
            self.pt_params,
        )

    @staticmethod
    def _frozen_out(emb):
        """Frozen-encoder outputs re-widen to fp32 for the trained policy."""
        return emb.astype(jnp.float32) if emb.dtype != jnp.float32 else emb

    def _frozen_fast_int8(self):
        """True when the frozen m3ae/mae tower runs the packed int8 path."""
        cfg = self.config
        return (
            cfg.get("frozen_int8", False)
            and not cfg.use_from_scratch
            and cfg.transfer_type.startswith(("mae", "m3ae"))
        )

    def _qpack(self):
        assert self.frozen_qpack is not None, (
            "config.frozen_int8 needs a calibrated pack: construct the policy "
            "with frozen_qpack=build_frozen_qpack(config, sample_batch, "
            "patch_dim) (the trainer CLI does this from its first batch)"
        )
        return self.frozen_qpack

    def _fast_score_dtype(self):
        sub = self.config.m3ae if self.config.transfer_type.startswith("m3ae") else self.config.mae
        return resolve_compute_dtype(sub.get("score_dtype", "float32")) or jnp.float32

    def _int8_attn(self) -> bool:
        """w8a8 attention on the packed frozen tower (normalized by
        get_policy_default_config: 'auto' resolved to 'true'/'false')."""
        return str(self.config.get("frozen_int8_attn", "false")).lower() in ("true", "1")

    # -- encode ---------------------------------------------------------------

    def encode(self, batch):
        cfg = self.config
        # ARPDT gates text on use_text (ARPDT.py:264); BC/GCBC read whatever
        # instruct the batch carries (BC.py:208, GCBC.py:366).
        text = batch.get("instruct", None) if (cfg.use_text or not self.use_rtg) else None

        if cfg.transfer_type.endswith("_cached"):
            image_batch = batch["image_emb"]
            num_image, batch_size, num_timestep = jnp.asarray(list(image_batch.values())).shape[:3]
            image = None
        else:
            image_batch = batch["image"]
            image = jnp.asarray(list(image_batch.values()))
            num_image, batch_size, num_timestep = image.shape[:3]

        state_batch = batch.get("state", None)
        state_emb = self.state_input(state_batch) if state_batch is not None else None

        action_batch = batch["action"]
        if cfg.use_discrete_action:
            action_batch = action_batch.astype(jnp.int32)
        action_emb = self.action_input(action_batch)

        rtg_emb = None
        if self.use_rtg:
            rtg = jnp.asarray(list(batch["rtg"].values())).astype(jnp.float32)
            if cfg.use_symlog:
                rtg = symlog(rtg)
            rtg = jnp.mean(rtg, axis=0)  # average rewards over views
            rtg_emb = self.rtg_input(rtg)

        text_padding_mask = batch.get("text_padding_mask", None)
        transfer_type = cfg.transfer_type

        def concat_multiple_image_emb(img_emb):
            img_emb = jnp.reshape(img_emb, (batch_size * num_image, num_timestep, -1))
            return jnp.concatenate(jnp.split(img_emb, num_image, axis=0), -1)

        if transfer_type.endswith("_cached"):
            # (num_image, B, T, D) precomputed embeddings -> same downstream
            # flow as the live clip path (adapter / text concat / tanh proj)
            emb = jnp.asarray(list(batch["image_emb"].values())).astype(jnp.float32)
            img_emb = emb.reshape((-1, emb.shape[-1]))
            goal_emb = None
            if self.use_goal:
                # separate-encode goal conditioning: the cached embedding at
                # the sampled hindsight-goal step, concatenated per timestep
                # (the joint live encode has no per-frame cache equivalent)
                assert batch.get("goal_emb") is not None, (
                    f"GCBC with {transfer_type} needs cached goal embeddings "
                    "(dataset use_cached_embeddings emits goal_emb; re-run "
                    "data/cache_embeddings.py if the cache predates them)"
                )
                gemb = jnp.asarray(list(batch["goal_emb"].values())).astype(jnp.float32)
                goal_emb = gemb.reshape((-1, gemb.shape[-1]))
            if cfg.use_adapter:
                # both halves of the conditioning vector must live in the
                # SAME embedding space: one shared adapter transforms obs AND
                # goal embeddings (adapted-obs ++ raw-goal was incoherent)
                if goal_emb is not None:
                    img_emb, goal_emb = self._apply_adapter(img_emb, goal_emb)
                else:
                    img_emb = self._apply_adapter(img_emb)
            img_emb = concat_multiple_image_emb(img_emb)
            if goal_emb is not None:
                img_emb = jnp.concatenate(
                    [img_emb, concat_multiple_image_emb(goal_emb)], axis=-1
                )
            # text conditioning in cached mode exists only when setup built
            # the CLIP text tower (use_text + clip_*_cached); BC/GCBC batches
            # always carry instruct ids, so gate on the config, not on `text`
            if cfg.use_text and transfer_type.startswith("clip") and text is not None:
                if cfg.use_from_scratch:
                    # setup() builds no pt_params in this combination — run
                    # the (trainable) text tower directly, like the live path
                    text_emb = self.pt_model.encode_text(text)
                else:
                    text_emb = self._frozen_clip_apply(self.pt_model.encode_text, text)
                text_emb = jnp.tile(jnp.expand_dims(text_emb, axis=1), (1, img_emb.shape[1], 1))
                image_text_emb = jnp.concatenate([img_emb, text_emb], axis=-1)
            else:
                image_text_emb = img_emb
            image_text_emb = nn.tanh(self.image_text_input(image_text_emb))
            image_text_emb = image_text_emb + get_1d_sincos_pos_embed(image_text_emb.shape[-1], num_timestep)
            return 1, image_text_emb, action_emb, state_emb, rtg_emb

        if transfer_type == "none":
            image = jnp.concatenate(list(image_batch.values()), axis=-1)
            image = jnp.reshape(image, (-1,) + image.shape[-3:])
            patch = self.patch_emb(self.patchify(image))
            num_obs_token = patch.shape[1]
            patch = patch + get_2d_sincos_pos_embed(patch.shape[-1], num_obs_token)
            patch = jnp.reshape(patch, (batch_size, num_timestep, -1))
            patch = patch + get_1d_sincos_pos_embed(patch.shape[-1], num_timestep)
            return num_obs_token, patch, action_emb, state_emb, rtg_emb

        if transfer_type.startswith("clip"):
            image = jnp.reshape(image, (-1,) + image.shape[-3:])
            if self.resize_clip_input and image.shape[1] != 224:
                image = jax.image.resize(
                    image, (image.shape[0], 224, 224, image.shape[-1]), method="bicubic"
                )
            if cfg.use_impala_backbone:
                img_emb = self.impala(image)
            elif cfg.use_from_scratch:
                img_emb = self.pt_model.encode_image(image)
            else:
                img_emb = self._frozen_clip_apply(self.pt_model.encode_image, image)

            if cfg.use_adapter:
                img_emb = jax.lax.stop_gradient(img_emb)
                img_emb = self._apply_adapter(img_emb)

            img_emb = concat_multiple_image_emb(img_emb)

            if text is not None:
                if cfg.use_from_scratch or cfg.use_impala_backbone:
                    text_emb = self.pt_model.encode_text(text)
                else:
                    text_emb = self._frozen_clip_apply(self.pt_model.encode_text, text)
                text_emb = jnp.tile(jnp.expand_dims(text_emb, axis=1), (1, img_emb.shape[1], 1))
                if cfg.use_adapter:
                    text_emb = jax.lax.stop_gradient(text_emb)
                image_text_emb = jnp.concatenate([img_emb, text_emb], axis=-1)
            else:
                image_text_emb = img_emb

            if not cfg.use_from_scratch and not cfg.use_impala_backbone and not cfg.use_adapter:
                image_text_emb = jax.lax.stop_gradient(image_text_emb)

            image_text_emb = nn.tanh(self.image_text_input(image_text_emb))
            image_text_emb = image_text_emb + get_1d_sincos_pos_embed(image_text_emb.shape[-1], num_timestep)
            return 1, image_text_emb, action_emb, state_emb, rtg_emb

        if transfer_type.startswith("mae"):
            image = jnp.reshape(image, (-1,) + image.shape[-3:])
            patch = self.patchify(image)
            if cfg.use_from_scratch:
                image_text_emb = self.pt_model.forward_representation(patch, deterministic=True)
            elif self._frozen_fast_int8():
                from ...ops import m3ae_infer

                image_text_emb = m3ae_infer.m3ae_encode_int8(
                    self._qpack(), patch, cfg.mae.num_heads,
                    score_dtype=self._fast_score_dtype(),
                    int8_attn=self._int8_attn(),
                )
            else:
                image_text_emb = self._frozen_out(self.pt_model.apply(
                    self._frozen_m3ae_params(), patch,
                    method=self.pt_model.forward_representation, deterministic=True,
                ))
            image_text_emb = jax.lax.stop_gradient(image_text_emb)
            if cfg.use_adapter:
                image_text_emb = self._apply_adapter(image_text_emb)
            image_text_emb = concat_multiple_image_emb(image_text_emb)
            image_text_emb = nn.tanh(self.image_text_input(image_text_emb))
            image_text_emb = image_text_emb + get_1d_sincos_pos_embed(image_text_emb.shape[-1], num_timestep)
            return 1, image_text_emb, action_emb, state_emb, rtg_emb

        if transfer_type.startswith("m3ae"):
            image = jnp.reshape(image, (-1,) + image.shape[-3:])
            patch = self.patchify(image)

            if self.use_goal:
                goal_image = jnp.asarray(list(batch["goal"].values()))
                goal_image = jnp.reshape(goal_image, (-1,) + goal_image.shape[-3:])
                goal_patch = self.patchify(goal_image)
                if cfg.use_from_scratch:
                    image_text_emb = self.pt_model.forward_gc_representations(
                        patch, goal_patch, deterministic=True
                    )
                elif self._frozen_fast_int8():
                    from ...ops import m3ae_infer

                    image_text_emb = m3ae_infer.m3ae_encode_int8(
                        self._qpack(), patch, cfg.m3ae.num_heads,
                        goal_patch=goal_patch, score_dtype=self._fast_score_dtype(),
                        int8_attn=self._int8_attn(),
                    )
                    image_text_emb = jax.lax.stop_gradient(image_text_emb)
                else:
                    image_text_emb = self._frozen_out(self.pt_model.apply(
                        self._frozen_m3ae_params(),
                        patch,
                        goal_patch,
                        method=self.pt_model.forward_gc_representations,
                        deterministic=True,
                    ))
                    image_text_emb = jax.lax.stop_gradient(image_text_emb)
                num_layers = 1
            else:
                if text is not None:
                    tokenized_caption = jnp.tile(text, (num_image * num_timestep, 1))
                    tiled_pad = jnp.tile(text_padding_mask, (num_image * num_timestep, 1))
                else:
                    tokenized_caption = None
                    tiled_pad = None

                if cfg.use_from_scratch:
                    image_text_emb = self.pt_model.forward_representation(
                        patch, tokenized_caption, tiled_pad, deterministic=True
                    )
                    num_layers = 1
                elif self._frozen_fast_int8():
                    from ...ops import m3ae_infer

                    if cfg.use_intermediate:
                        out, inter = m3ae_infer.m3ae_encode_int8(
                            self._qpack(), patch, cfg.m3ae.num_heads,
                            text_ids=tokenized_caption, text_padding_mask=tiled_pad,
                            score_dtype=self._fast_score_dtype(),
                            return_intermediates=True,
                            int8_attn=self._int8_attn(),
                        )
                        num_layers = cfg.m3ae.depth
                        # (L-1, B', N, D) block outputs flatten along batch —
                        # the same layout the flax intermediates concat builds
                        inter = self._frozen_out(
                            inter[:-1].reshape((-1,) + inter.shape[2:])
                        )
                        image_text_emb = jnp.concatenate([inter, out], axis=0)
                    else:
                        image_text_emb = m3ae_infer.m3ae_encode_int8(
                            self._qpack(), patch, cfg.m3ae.num_heads,
                            text_ids=tokenized_caption, text_padding_mask=tiled_pad,
                            score_dtype=self._fast_score_dtype(),
                            int8_attn=self._int8_attn(),
                        )
                        num_layers = 1
                elif cfg.use_intermediate:
                    image_text_emb, states = self.pt_model.apply(
                        self._frozen_m3ae_params(),
                        patch,
                        tokenized_caption,
                        tiled_pad,
                        method=self.pt_model.forward_representation,
                        deterministic=True,
                        capture_intermediates=True,
                        mutable=["intermediates"],
                    )
                    num_layers = cfg.m3ae.depth
                    intermediate_embs = [
                        self._frozen_out(
                            states["intermediates"]["encoder"][f"intermediate_layer_{i}"][0]
                        )
                        for i in range(num_layers - 1)
                    ]
                    image_text_emb = jnp.concatenate(
                        intermediate_embs + [self._frozen_out(image_text_emb)], axis=0
                    )
                else:
                    image_text_emb = self._frozen_out(self.pt_model.apply(
                        self._frozen_m3ae_params(),
                        patch,
                        tokenized_caption,
                        tiled_pad,
                        method=self.pt_model.forward_representation,
                        deterministic=True,
                    ))
                    num_layers = 1
                image_text_emb = jax.lax.stop_gradient(image_text_emb)

            if cfg.use_adapter:
                image_text_emb = self._apply_adapter(image_text_emb)

            image_text_emb = jnp.reshape(image_text_emb, (batch_size * num_image * num_layers, num_timestep, -1))
            image_text_emb = jnp.concatenate(jnp.split(image_text_emb, num_layers, axis=0), -1)
            image_text_emb = nn.tanh(self.image_text_input(image_text_emb))
            image_text_emb = jnp.concatenate(jnp.split(image_text_emb, num_image, axis=0), -1)
            return num_image, image_text_emb, action_emb, state_emb, rtg_emb

        raise ValueError("Unsupported transfer type!")

    # -- forward --------------------------------------------------------------
    # @nn.compact so encode() may create the inline AdapterMLP submodules
    # (mirrors the reference, which builds adapters inside its compact
    # __call__, ARPDT.py:341-346).

    @nn.compact
    def __call__(self, batch, deterministic=False):
        cfg = self.config
        batch_size, num_timestep = batch["action"].shape[:2]

        num_obs_token, image_embed, action_emb, state_emb, rtg_emb = self.encode(batch)

        parts = [image_embed]
        extra = 1  # action
        if state_emb is not None:
            parts.append(state_emb)
            extra += 1
        if rtg_emb is not None:
            parts.append(rtg_emb)
            extra += 1
        parts.append(action_emb)
        token_embed = jnp.concatenate(parts, axis=-1)
        num_token_per_step = num_obs_token + extra
        token_embed = jnp.reshape(
            token_embed, [batch_size, num_token_per_step * num_timestep, cfg.emb_dim]
        )

        if cfg.model_type is not None and cfg.model_type.startswith("vit"):
            mask_spec = MaskSpec("dt", num_obs_token=num_obs_token, num_token_per_step=num_token_per_step)
        else:
            mask_spec = MaskSpec("causal")

        output_embed = self.policy(token_embed, deterministic=deterministic, mask_spec=mask_spec)

        # position of the token whose output predicts the action: the last
        # token *before* the action slot (reference: ARPDT.py:203-208,
        # BC.py:165-168).
        action_pos = num_obs_token + extra - 2  # obs..., [state], [rtg] -> predict action
        action_pred = self.action_outputs(output_embed[:, action_pos::num_token_per_step, :])

        output = {"action_pred": action_pred}
        if self.use_rtg:
            return_pos = action_pos - 1
            return_pred = self.return_outputs(output_embed[:, return_pos::num_token_per_step, :])
            output["return_pred"] = return_pred
            loss, acc, info = self._compute_loss_rtg(action_pred, batch["action"], return_pred, batch["rtg"])
            output.update(loss=loss, acc=acc, trans_loss=info["trans_loss"], return_loss=info["return_loss"])
        else:
            loss, acc = self._compute_loss(action_pred, batch["action"])
            output.update(loss=loss, acc=acc)
        return output

    def _compute_loss(self, action_pred, action):
        if not self.config.use_discrete_action:
            if self.normalize_quterion:
                # [:, 3:7] slices the TIME axis on a (B, T, A) tensor — exact
                # reference parity (ARPDT.py:240-243 / BC.py:186-195 do the
                # same); vestigial for Procgen's discrete actions
                x = action_pred[:, 3:7]
                x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
                action_pred = action_pred.at[:, 3:7].set(x)
            return mse_loss(action_pred, action), 0.0
        return cross_entropy(action_pred, action, self.num_actions)

    def _compute_loss_rtg(self, action_pred, action, rtg_pred, rtg):
        loss, acc = self._compute_loss(action_pred, action)
        info = {"trans_loss": loss, "return_loss": 0.0}
        if rtg_pred is not None and rtg is not None:
            rtg = jnp.asarray(list(rtg.values())).astype(jnp.float32)
            if self.config.use_symlog:
                rtg = symlog(rtg)
            rtg = jnp.mean(rtg, axis=0)
            return_loss = mse_loss(rtg_pred, rtg)
            loss = loss + self.config.lambda_return_pred * return_loss
            info["return_loss"] = return_loss
        return loss, acc, info

    def greedy_action(self, batch):
        pred = self(batch, deterministic=True)["action_pred"][:, -1, :]
        if not self.config.use_discrete_action:
            return pred
        return pred.argmax(-1)

    def greedy_return(self, batch):
        # symexp applied unconditionally — exact reference parity
        # (ARPDT.py:494-495 does the same even when use_symlog is off)
        return symexp(self(batch, deterministic=True)["return_pred"])

    def sample_action(self, batch, rng, temperature: float = 1.0):
        """Seeded temperature sampling over the action logits.

        Beyond the reference (ARPDT.py:488-492 is greedy-only): greedy decode
        makes collapsed policies bit-identical across methods on shared
        initial states (round-4 finding — every method landed on the same
        22.11-step episodes), so ordering experiments sample instead.
        temperature -> 0 recovers greedy; the rng is caller-seeded so evals
        stay reproducible.
        """
        pred = self(batch, deterministic=True)["action_pred"][:, -1, :]
        if not self.config.use_discrete_action:
            return pred
        return jax.random.categorical(rng, pred / jnp.maximum(temperature, 1e-6), axis=-1)


class ARPDT(BasePolicy):
    """Return-conditioned policy with CLIP rewards (reference: arp_dt/ARPDT.py)."""

    use_rtg: bool = True
    use_goal: bool = False
    resize_clip_input: bool = False


class BC(BasePolicy):
    """Behavior cloning / InstructRL-with-text baseline (reference: arp_dt/BC.py)."""

    use_rtg: bool = False
    use_goal: bool = False
    resize_clip_input: bool = True


class GCBC(BasePolicy):
    """Goal-conditioned BC with joint (obs, goal) encoding (reference: arp_dt/GCBC.py)."""

    use_rtg: bool = False
    use_goal: bool = True
    resize_clip_input: bool = True


def build_frozen_qpack(
    config_updates,
    sample_batch,
    patch_dim: int,
    image_size: int = 256,
    use_goal: bool = False,
    m3ae_loader=None,
    amax=None,
    return_amax: bool = False,
):
    """Calibrate the int8 pack for a frozen_int8 policy from REAL frames.

    ``sample_batch`` is one host batch in the trainer's layout (``image``:
    {key: (B, T, H, W, C)}, optional ``instruct``/``text_padding_mask``/
    ``goal``).  Frames go through the deterministic eval transform (resize +
    the exact Procgen normalization) so the calibration sees the same
    activation distribution the in-step encode sees; the pack's 5% margin
    covers augmentation jitter (same recipe as the reward engine's lazy int8
    calibration).  Returns the qpack to pass as the policy's ``frozen_qpack``.

    ``amax``: previously-saved calibration scales (see train/common.py
    ``save_frozen_amax``) — skips calibration so a restored checkpoint sees
    the SAME frozen-tower numerics it trained with instead of recalibrating
    on whatever batch the eval process sampled.  ``return_amax=True``
    additionally returns the (host) amax tree for persisting.
    """
    from ...ops import m3ae_infer
    from ...ops.augment import make_eval_transform
    from ..m3ae import extract_patches

    cfg = get_policy_default_config(config_updates)
    tt = cfg.transfer_type
    assert cfg.frozen_int8, "build_frozen_qpack is only for frozen_int8 configs"
    assert tt.startswith(("mae", "m3ae")) and not tt.endswith("_cached"), tt
    sub = cfg.m3ae if tt.startswith("m3ae") else cfg.mae
    loader = m3ae_loader or m3ae_lib.load_m3ae_model_vars
    variables = loader(tt.split("_", 1)[1])

    if amax is not None:
        packed = m3ae_infer.pack_m3ae_params(variables, sub.depth)
        qpack = m3ae_infer.quantize_m3ae_packed(packed, amax)
        return (qpack, amax) if return_amax else qpack

    transform = make_eval_transform(image_size=image_size)

    def to_patches(tree):
        frames = jnp.concatenate(
            [jnp.asarray(v).reshape((-1,) + v.shape[-3:]) for v in tree.values()], axis=0
        )
        return extract_patches(transform(frames), patch_dim)

    patch = to_patches(sample_batch["image"])
    text_ids = pad = goal = None
    if use_goal and sample_batch.get("goal") is not None:
        goal = to_patches(sample_batch["goal"])
        # goal-joint encode pairs each obs frame with a goal frame
        n = min(patch.shape[0], goal.shape[0])
        patch, goal = patch[:n], goal[:n]
    elif cfg.use_text and tt.startswith("m3ae") and sample_batch.get("instruct") is not None:
        ids = jnp.asarray(sample_batch["instruct"])
        pm = jnp.asarray(sample_batch["text_padding_mask"])
        reps = -(-patch.shape[0] // ids.shape[0])  # cover every patch row
        text_ids = jnp.tile(ids, (reps, 1))[: patch.shape[0]]
        pad = jnp.tile(pm, (reps, 1))[: patch.shape[0]]
    return m3ae_infer.build_m3ae_qpack(
        variables, sub.depth, sub.num_heads, patch,
        text_ids=text_ids, text_padding_mask=pad, goal_patch=goal,
        return_amax=return_amax,
    )
