"""Shared transformer layers.

One implementation serving every policy model (ARPDT / BC / GCBC) and the
M3AE encoder-decoder.  The reference duplicates this stack three times
(arp_dt/layers.py, arp_dt/GCBC.py:19-174, arp_dt/models/m3ae/model.py:202-312);
here it exists once, built on the fused attention op (arp_tpu/ops/attention.py)
with lazy mask specs instead of host-materialized (n, n) masks.

TPU notes:
  * attention runs through `dot_product_attention` — Pallas flash kernel on
    TPU for long sequences, fused XLA einsum otherwise;
  * all matmuls keep the model dim as the trailing (lane) axis; param layouts
    are compatible with the tp sharding rules in arp_tpu/parallel/mesh.py
    (qkv/fc1 shard columns, attn_out/fc2 shard rows);
  * an optional ``compute_dtype`` runs the block in bfloat16 with fp32
    layernorms/softmax, the standard TPU mixed-precision recipe.
"""

from __future__ import annotations

import math
from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import dot_product_attention
from ..ops.masks import MaskSpec


def get_attention_slopes(n: int):
    """ALiBi-style head slopes (reference: arp_dt/layers.py:102-115)."""

    def power_of_2(n):
        start = 2 ** (-(2 ** -(math.log2(n) - 3)))
        return [start * start**i for i in range(n)]

    if math.log2(n).is_integer():
        return power_of_2(n)
    closest = 2 ** math.floor(math.log2(n))
    return power_of_2(closest) + get_attention_slopes(2 * closest)[0::2][: n - closest]


def resolve_compute_dtype(name):
    """Config string -> Transformer ``compute_dtype``: "float32" means default
    precision (None); anything else is a jnp dtype (e.g. "bfloat16")."""
    return None if name == "float32" else jnp.dtype(name)


class FeedForward(nn.Module):
    """Pre-activation MLP: fc1 -> act -> drop -> fc2 -> drop."""

    dim: int = 256
    out_dim: int = 256
    dropout: float = 0.0
    use_bias: bool = False
    activation: str = "gelu"
    kernel_init: Callable = nn.initializers.xavier_uniform()
    dtype: Any = None  # computation dtype for the matmuls (params stay fp32)

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = nn.Dense(self.dim, use_bias=self.use_bias, kernel_init=self.kernel_init, dtype=self.dtype, name="fc1")(x)
        if self.activation == "gelu":
            x = nn.gelu(x)
        elif self.activation == "quick_gelu":
            x = x * nn.sigmoid(1.702 * x)
        else:
            raise ValueError(self.activation)
        x = nn.Dropout(self.dropout)(x, deterministic)
        x = nn.Dense(self.out_dim, use_bias=self.use_bias, kernel_init=self.kernel_init, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic)
        return x


class DenseQKV(nn.Module):
    """Fused-parameter q/k/v projection executed as three narrow matmuls.

    The parameter layout is EXACTLY ``nn.Dense(3*dim, name="qkv")`` — one
    (in_dim, 3*dim) ``kernel`` (+ optional ``bias``) — so converted reference
    checkpoints and every existing param tree are untouched.  The forward,
    however, slices the kernel per projection instead of computing the wide
    matmul and re-slicing its output: on a v5e the (b, n, 3, h, d)
    reshape+slice of the fused output forced a materialized relayout of the
    whole qkv tensor, capping a ViT-B block stack at 54 TF/s; three
    kernel-sliced (D, D) matmuls fuse cleanly and reach 85 TF/s, matching
    separate q/k/v Dense layers (scripts/bench_block_isolate.py).
    """

    dim: int
    use_bias: bool = False
    kernel_init: Callable = nn.linear.default_kernel_init
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        from flax.linen.dtypes import promote_dtype

        kernel = self.param("kernel", self.kernel_init, (x.shape[-1], 3 * self.dim))
        bias = (
            self.param("bias", nn.initializers.zeros, (3 * self.dim,))
            if self.use_bias
            else None
        )
        x, kernel, bias = promote_dtype(x, kernel, bias, dtype=self.dtype)
        outs = []
        for i in range(3):
            w = jax.lax.slice_in_dim(kernel, i * self.dim, (i + 1) * self.dim, axis=1)
            y = x @ w
            if bias is not None:
                y = y + jax.lax.slice_in_dim(bias, i * self.dim, (i + 1) * self.dim, axis=0)
            outs.append(y)
        return outs


class Attention(nn.Module):
    """Multi-head self-attention with a lazy mask spec.

    Matches the reference numerics (arp_dt/layers.py:45-99) while never
    materializing batch-sized masks; ALiBi bias (key-index form, as in the
    reference) goes through the XLA path as an additive bias.
    """

    dim: int
    num_heads: int = 8
    use_bias: bool = False
    att_drop: float = 0.0
    proj_drop: float = 0.0
    alibi_bias: bool = False
    kernel_init: Callable = nn.linear.default_kernel_init
    # computation dtype for the qkv/out projections; the attention op itself
    # does fp32 scores + softmax by default (ops/attention.py)
    dtype: Any = None
    # dtype of the (B, H, N, N) score tensor + softmax (None = fp32).  bf16
    # halves the score tensor's HBM traffic — the dominant byte term of a
    # long-sequence frozen encoder — at the cost of bf16 softmax statistics.
    # Chip-dependent: measure before enabling (see docs/BENCHMARKS.md).
    score_dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic=True, mask_spec=MaskSpec("causal"), kv_padding=None):
        b, n, _ = x.shape
        head_dim = self.dim // self.num_heads
        q, k, v = (
            t.reshape(b, n, self.num_heads, head_dim)
            for t in DenseQKV(
                self.dim, use_bias=self.use_bias, kernel_init=self.kernel_init,
                dtype=self.dtype, name="qkv",
            )(x)
        )

        bias = None
        impl = None
        if self.alibi_bias:
            # Reference form: slope_h * k_index, independent of q, added to the
            # already-scaled scores (layers.py:74-78).
            slopes = jnp.asarray(np.array(get_attention_slopes(self.num_heads)), jnp.float32)
            bias = (slopes[:, None, None] * jnp.arange(n, dtype=jnp.float32)[None, None, :])[None]
            bias = jnp.broadcast_to(bias, (1, self.num_heads, n, n))
            impl = "xla"

        use_prob_dropout = self.att_drop > 0 and not deterministic
        if use_prob_dropout:
            # exact reference semantics (layers.py:88): dropout on the
            # attention *probabilities*.  Incompatible with the fused kernel,
            # so compute attention explicitly on the XLA path for this case
            # (training-only; defaults never hit it).
            from ..ops.masks import combine_padding, materialize_mask

            scale = head_dim**-0.5
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
            if bias is not None:
                s = s + bias
            mask = materialize_mask(mask_spec, n)[None, None]
            if kv_padding is not None:
                mask = combine_padding(mask, kv_padding)
            s = jnp.where(mask, s, jnp.finfo(s.dtype).min)
            p = jax.nn.softmax(s, axis=-1)
            p = nn.Dropout(self.att_drop)(p, deterministic)
            out = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v)
        else:
            out = dot_product_attention(
                q, k, v, spec=mask_spec, kv_padding=kv_padding, bias=bias, impl=impl,
                score_dtype=self.score_dtype or jnp.float32,
            )
        out = out.reshape(b, n, self.dim)
        out = nn.Dense(self.dim, use_bias=self.use_bias, kernel_init=self.kernel_init, dtype=self.dtype, name="attn_out")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic)
        return out


class DropPath(nn.Module):
    """Stochastic depth (reference: m3ae/model.py:185-199)."""

    dropout_prob: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        import jax

        if deterministic or self.dropout_prob == 0.0:
            return x
        keep_prob = 1 - self.dropout_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        rng = self.make_rng("drop_path")
        random_tensor = jnp.floor(keep_prob + jax.random.uniform(rng, shape, dtype=jnp.float32))
        return (x / keep_prob) * random_tensor


class Block(nn.Module):
    """Pre-LN transformer block."""

    dim: int = 256
    num_heads: int = 8
    mlp_ratio: int = 4
    att_drop: float = 0.0
    drop: float = 0.0
    drop_path: float = 0.0
    alibi_bias: bool = False
    use_attn_bias: bool = True
    mlp_bias: bool = False
    activation: str = "gelu"
    # mixed precision: run the block's matmuls in this dtype (bf16 on TPU)
    # with fp32 layernorms, fp32 attention softmax, and fp32 residual stream —
    # the standard TPU recipe. Params always stay fp32.
    compute_dtype: Any = None
    # frozen-tower inference recipe: a dtype here (bf16) runs the layernorms
    # in that dtype too, so with a pre-cast param tree and a cast input the
    # whole block — residual stream included — stays in one narrow dtype with
    # zero cast ping-pong (attention softmax stays fp32 in ops/attention.py).
    # None keeps the training recipe above (fp32 LNs). Only set this on
    # frozen (stop_gradient) towers: it halves LN/residual HBM traffic at the
    # cost of bf16 LN statistics.
    ln_dtype: Any = None
    # dtype of the attention score tensor + softmax (None = fp32); see
    # Attention.score_dtype. Only for frozen towers; measure per chip.
    score_dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic=True, mask_spec=MaskSpec("causal"), kv_padding=None):
        y = nn.LayerNorm(dtype=self.ln_dtype or jnp.float32, name="norm1")(x)
        if self.compute_dtype is not None:
            y = y.astype(self.compute_dtype)
        y = Attention(
            self.dim,
            self.num_heads,
            use_bias=self.use_attn_bias,
            att_drop=self.att_drop,
            proj_drop=self.drop,
            alibi_bias=self.alibi_bias,
            dtype=self.compute_dtype,
            score_dtype=self.score_dtype,
            name="attn",
        )(y, deterministic, mask_spec, kv_padding)
        y = DropPath(self.drop_path)(y, deterministic)
        x = x + y.astype(x.dtype)

        y = nn.LayerNorm(dtype=self.ln_dtype or jnp.float32, name="norm2")(x)
        if self.compute_dtype is not None:
            y = y.astype(self.compute_dtype)
        y = FeedForward(
            self.dim * self.mlp_ratio, self.dim, self.drop, use_bias=self.mlp_bias,
            activation=self.activation, dtype=self.compute_dtype, name="mlp",
        )(y, deterministic)
        y = DropPath(self.drop_path)(y, deterministic)
        return x + y.astype(x.dtype)


class Transformer(nn.Module):
    """Stack of pre-LN blocks with a final LayerNorm.

    ``sow_intermediates`` records each block's output under
    ``intermediates/intermediate_layer_{i}`` — used by the InstructRL-style
    multi-layer feature concat (reference: m3ae/model.py:309).
    """

    emb_dim: int = 1024
    depth: int = 24
    att_drop: float = 0.0
    drop: float = 0.0
    drop_path: float = 0.0
    num_heads: int = 16
    mlp_ratio: int = 4
    alibi_bias: bool = False
    mlp_bias: bool = False
    activation: str = "gelu"
    sow_intermediates: bool = False
    # rematerialize each block on the backward pass (jax.checkpoint): trades
    # one extra forward for O(depth) fewer stored activations — the standard
    # TPU HBM-for-FLOPs trade for deep stacks / large batches.
    remat: bool = False
    # run block matmuls in this dtype (e.g. jnp.bfloat16); see Block
    compute_dtype: Any = None
    # frozen-tower full-cast recipe: run LNs and the residual stream in this
    # dtype too (see Block.ln_dtype). The input is cast on entry so the
    # residual stream never re-widens. None = fp32 LNs (training recipe).
    ln_dtype: Any = None
    # attention score/softmax dtype (None = fp32); see Attention.score_dtype.
    score_dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic=True, mask_spec=MaskSpec("causal"), kv_padding=None):
        if self.ln_dtype is not None:
            x = x.astype(self.ln_dtype)
        # static_argnums: 0 is the module itself; 2/3 are deterministic and the
        # (frozen-dataclass, hashable) MaskSpec
        block_cls = nn.remat(Block, static_argnums=(2, 3)) if self.remat else Block
        for i in range(self.depth):
            x = block_cls(
                self.emb_dim,
                self.num_heads,
                self.mlp_ratio,
                self.att_drop,
                self.drop,
                self.drop_path,
                self.alibi_bias,
                mlp_bias=self.mlp_bias,
                activation=self.activation,
                compute_dtype=self.compute_dtype,
                ln_dtype=self.ln_dtype,
                score_dtype=self.score_dtype,
                name=f"blocks_{i}",
            )(x, deterministic, mask_spec, kv_padding)
            if self.sow_intermediates:
                self.sow("intermediates", f"intermediate_layer_{i}", x)
        return nn.LayerNorm(dtype=self.ln_dtype, name="norm")(x)


class PipelinedTransformer(nn.Module):
    """Transformer stack pipelined over the mesh's ``pp`` axis.

    Same math as :class:`Transformer` (verified by stacking its params, see
    ``stack_transformer_params``), but the blocks live as ONE stacked param
    tree ``stacked_blocks`` with leading axis (stages, depth // stages, ...):
    stage s holds its depth/S consecutive blocks on its own pp-mesh slice and
    microbatches flow stage-to-stage via lax.ppermute
    (parallel/pipeline.py::pipeline_apply).  Composes with dp/fsdp batch
    sharding; tp inside stages is unsupported (manual region).

    Dropout/drop-path must be 0 — per-layer rng plumbing through the
    pipelined region is not implemented, and silently different dropout
    patterns would break dp==pp update parity.
    """

    emb_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: int = 4
    alibi_bias: bool = False
    mlp_bias: bool = False
    activation: str = "gelu"
    stages: int = 2
    microbatches: int = 2
    mesh: Any = None
    # jax.checkpoint each scanned layer (prevent_cse=False is safe — and
    # recommended — under lax.scan); same HBM-for-FLOPs trade as Transformer
    remat: bool = False
    # bf16 block matmuls (see Block.compute_dtype)
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic=True, mask_spec=MaskSpec("causal"), kv_padding=None):
        from ..parallel.pipeline import pipeline_apply

        assert self.mesh is not None, "PipelinedTransformer needs the device mesh"
        assert self.depth % self.stages == 0, (self.depth, self.stages)
        per_stage = self.depth // self.stages
        block = Block(
            self.emb_dim,
            self.num_heads,
            self.mlp_ratio,
            alibi_bias=self.alibi_bias,
            mlp_bias=self.mlp_bias,
            activation=self.activation,
            compute_dtype=self.compute_dtype,
        )

        def init_stacked(rng):
            probe = jnp.zeros((1, max(x.shape[1], 1), self.emb_dim), x.dtype)

            def one_layer(key):
                return block.init(key, probe, True, mask_spec, kv_padding)["params"]

            tree = jax.vmap(one_layer)(jax.random.split(rng, self.depth))
            return jax.tree_util.tree_map(
                lambda p: p.reshape((self.stages, per_stage) + p.shape[1:]), tree
            )

        stacked = self.param("stacked_blocks", init_stacked)

        def stage_fn(stage_params, act):
            def layer(act, layer_params):
                out = block.apply(
                    {"params": layer_params}, act, deterministic, mask_spec, kv_padding
                )
                return out, None

            if self.remat:
                layer = jax.checkpoint(layer, prevent_cse=False)
            act, _ = jax.lax.scan(layer, act, stage_params)
            return act

        # batch must divide into microbatches; small batches (e.g. the
        # trainer's batch-1 init probe) degrade gracefully to fewer
        microbatches = math.gcd(x.shape[0], self.microbatches)
        x = pipeline_apply(stage_fn, stacked, x, self.mesh, microbatches)
        return nn.LayerNorm(name="norm")(x)


def stack_transformer_params(params: dict, stages: int) -> dict:
    """Convert a flat :class:`Transformer` param tree (blocks_i/...) to the
    :class:`PipelinedTransformer` layout (stacked_blocks + norm)."""
    depth = len([k for k in params if k.startswith("blocks_")])
    assert depth % stages == 0
    layers = [params[f"blocks_{i}"] for i in range(depth)]
    stacked = jax.tree_util.tree_map(lambda *ps: jnp.stack(ps), *layers)
    stacked = jax.tree_util.tree_map(
        lambda p: p.reshape((stages, depth // stages) + p.shape[1:]), stacked
    )
    return {"stacked_blocks": stacked, "norm": params["norm"]}


def unstack_transformer_params(params: dict) -> dict:
    """Inverse of :func:`stack_transformer_params`."""
    stacked = params["stacked_blocks"]
    s, per = jax.tree_util.tree_leaves(stacked)[0].shape[:2]
    out = {}
    for i in range(s * per):
        out[f"blocks_{i}"] = jax.tree_util.tree_map(
            lambda p: p[i // per, i % per], stacked
        )
    out["norm"] = params["norm"]
    return out


class AdapterMLP(nn.Module):
    """Parameter-efficient adapter MLP (reference: models/adapter/layers.py)."""

    hidden_dim: int = 1024
    output_dim: int = 1024
    num_layers: int = 2
    kernel_init: Callable = nn.initializers.xavier_uniform

    @nn.compact
    def __call__(self, x):
        for _ in range(self.num_layers - 1):
            x = nn.Dense(self.hidden_dim, kernel_init=self.kernel_init())(x)
            x = nn.relu(x)
        x = nn.Dense(self.output_dim, kernel_init=self.kernel_init())(x)
        return nn.relu(x)


class MLP(nn.Module):
    """Residual MLP head used by M3AE decoders (reference: m3ae/model.py:160-182)."""

    hidden_dim: int
    output_dim: int
    depth: int
    input_norm: bool = True

    @nn.compact
    def __call__(self, x):
        if self.input_norm:
            x = nn.LayerNorm()(x)
        for i in range(self.depth):
            y = nn.Dense(self.hidden_dim, kernel_init=nn.initializers.xavier_uniform())(x)
            y = nn.gelu(y)
            y = nn.LayerNorm()(y)
            x = x + y if i > 0 else y
        return nn.Dense(self.output_dim, kernel_init=nn.initializers.xavier_uniform())(x)
