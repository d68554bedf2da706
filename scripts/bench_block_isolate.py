"""Isolate why the shared layers.Transformer underruns the CLIP tower.

bench_m3ae_dtype.py showed (v5e, identical 257x768x12 shapes):
  clip tower full-bf16      83.6 TF/s
  m3ae full-bf16 (ln_dtype) 54.5 TF/s
so the gap is structural, not dtype. Legs here bisect the stack:

  clip_tower      CLIP VisionTransformer (reference point)
  shared_tf       layers.Transformer alone, full-bf16, mlp_bias=True
  shared_tf_sow   + sow_intermediates=True (the m3ae construction)
  clip_blocks     CLIPTransformer (ResidualAttentionBlock stack) alone

Whichever leg drops from 84 to ~55 carries the defect.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_block_isolate.py
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401  (persistent compile cache config)

D, L, HEADS = 768, 12, 12
N = 257
GF_TF = L * (24 * N * D * D + 4 * N * N * D) / 1e9  # transformer-only, per frame


def scan_run(apply_fn, params, frames, steps, in_dtype):
    @jax.jit
    def run(p, key):
        def body(c, i):
            x = jax.random.uniform(jax.random.fold_in(key, i), (frames, N, D), in_dtype)
            out = apply_fn(p, x)
            return c + jnp.sum(out.astype(jnp.float32)), None

        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(steps))
        return c

    t0 = time.time()
    np.asarray(run(params, jax.random.PRNGKey(7)))
    compile_s = time.time() - t0
    best = float("inf")
    for p in range(3):
        t0 = time.time()
        np.asarray(run(params, jax.random.PRNGKey(p)))
        best = min(best, time.time() - t0)
    return compile_s, best


def bf16_tree(tree):
    return jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if jnp.issubdtype(p.dtype, jnp.floating) else p, tree
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--steps", type=int, default=16)
    args = ap.parse_args()

    from arp_tpu.models.clip.model import CLIPTransformer
    from arp_tpu.models.layers import Transformer
    from arp_tpu.ops.masks import MaskSpec

    results = {}
    probe = jnp.zeros((1, N, D), jnp.float32)

    def leg(label, module, in_dtype=jnp.bfloat16, apply_kwargs=None):
        params = jax.jit(lambda r: module.init(r, probe, *(apply_kwargs or ())))(
            jax.random.PRNGKey(0)
        )
        params = bf16_tree(params)

        def apply_fn(p, x, _m=module):
            return _m.apply(p, x, *(apply_kwargs or ()))

        compile_s, best = scan_run(apply_fn, params, args.frames, args.steps, in_dtype)
        fps = args.frames * args.steps / best
        results[label] = round(fps)
        print(f"{label:14s}: compile {compile_s:5.1f}s  {fps:8.0f} frames/s  {fps*GF_TF/1e3:6.1f} TF/s")

    leg("clip_blocks", CLIPTransformer(features=D, num_layers=L, num_heads=HEADS))
    leg(
        "shared_tf",
        Transformer(
            emb_dim=D, depth=L, num_heads=HEADS, mlp_ratio=4, mlp_bias=True,
            compute_dtype=jnp.bfloat16, ln_dtype=jnp.bfloat16,
        ),
        apply_kwargs=(True, MaskSpec("none")),
    )
    leg(
        "shared_tf_sow",
        Transformer(
            emb_dim=D, depth=L, num_heads=HEADS, mlp_ratio=4, mlp_bias=True,
            compute_dtype=jnp.bfloat16, ln_dtype=jnp.bfloat16, sow_intermediates=True,
        ),
        apply_kwargs=(True, MaskSpec("none")),
    )
    print(results)




# --- appended finer bisect: attention impl vs activation ---------------------
def finer():
    import flax.linen as nn
    from arp_tpu.models.clip.model import CLIPAttention
    from arp_tpu.models.layers import Attention, FeedForward
    from arp_tpu.ops.masks import MaskSpec

    from arp_tpu.ops.attention import dot_product_attention

    class SplitAttention(nn.Module):
        """Fused qkv Dense, but q/k/v via split(axis=-1) + per-tensor reshape
        (identical numerics + param layout to layers.Attention's
        reshape(b,n,3,h,d) + slice — only the XLA access pattern differs)."""

        @nn.compact
        def __call__(self, x):
            b, n, d = x.shape
            hd = d // HEADS
            qkv = nn.Dense(d * 3, use_bias=True, dtype=jnp.bfloat16, name="qkv")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            split = lambda t: t.reshape(b, n, HEADS, hd)
            out = dot_product_attention(split(q), split(k), split(v), spec=MaskSpec("none"))
            out = out.reshape(b, n, d)
            return nn.Dense(d, use_bias=True, dtype=jnp.bfloat16, name="attn_out")(out)

    class KSliceAttention(nn.Module):
        """qkv param layout kept, but THREE (D,D) matmuls over kernel slices
        (the separate-dense access pattern without the param-tree change)."""

        @nn.compact
        def __call__(self, x):
            b, n, d = x.shape
            hd = d // HEADS
            kernel = self.param("kernel_probe", nn.initializers.lecun_normal(), (d, 3 * d))
            bias = self.param("bias_probe", nn.initializers.zeros, (3 * d,))
            k16 = kernel.astype(jnp.bfloat16)
            outs = []
            for i in range(3):
                w = jax.lax.slice_in_dim(k16, i * d, (i + 1) * d, axis=1)
                bb = jax.lax.slice_in_dim(bias.astype(jnp.bfloat16), i * d, (i + 1) * d, axis=0)
                outs.append((x @ w + bb).reshape(b, n, HEADS, hd))
            q, k, v = outs
            out = dot_product_attention(q, k, v, spec=MaskSpec("none"))
            out = out.reshape(b, n, d)
            return nn.Dense(d, use_bias=True, dtype=jnp.bfloat16, name="attn_out")(out)

    class HybridBlock(nn.Module):
        """layers.Block body with CLIP's separate-q/k/v attention."""

        attn_impl: str = "clip"  # "clip" | "fused" | "split"
        activation: str = "gelu"

        @nn.compact
        def __call__(self, x):
            y = nn.LayerNorm(dtype=jnp.bfloat16, name="norm1")(x)
            if self.attn_impl == "clip":
                y = CLIPAttention(HEADS, name="attn")(y, MaskSpec("none"))
            elif self.attn_impl == "split":
                y = SplitAttention(name="attn")(y)
            elif self.attn_impl == "kslice":
                y = KSliceAttention(name="attn")(y)
            else:
                y = Attention(D, HEADS, use_bias=True, dtype=jnp.bfloat16, name="attn")(
                    y, True, MaskSpec("none")
                )
            x = x + y
            y = nn.LayerNorm(dtype=jnp.bfloat16, name="norm2")(x)
            y = FeedForward(D * 4, D, use_bias=True, activation=self.activation,
                            dtype=jnp.bfloat16, name="mlp")(y, True)
            return x + y

    class Stack(nn.Module):
        attn_impl: str = "clip"
        activation: str = "gelu"

        @nn.compact
        def __call__(self, x):
            for i in range(L):
                x = HybridBlock(self.attn_impl, self.activation, name=f"b{i}")(x)
            return nn.LayerNorm(dtype=jnp.bfloat16, name="norm")(x)

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--steps", type=int, default=16)
    args, _ = ap.parse_known_args()

    probe = jnp.zeros((1, N, D), jnp.bfloat16)
    results = {}
    for label, attn_impl, act in (
        ("splitattn_gelu", "split", "gelu"),
        ("kslice_gelu", "kslice", "gelu"),
        ("clipattn_gelu", "clip", "gelu"),
    ):
        module = Stack(attn_impl, act)
        params = bf16_tree(jax.jit(module.init)(jax.random.PRNGKey(0), probe))
        compile_s, best = scan_run(lambda p, x, _m=module: _m.apply(p, x),
                                   params, args.frames, args.steps, jnp.bfloat16)
        fps = args.frames * args.steps / best
        results[label] = round(fps)
        print(f"{label:16s}: compile {compile_s:5.1f}s  {fps:8.0f} frames/s  {fps*GF_TF/1e3:6.1f} TF/s")
    print(results)


if __name__ == "__main__":
    import sys as _sys
    if "--finer" in _sys.argv:
        _sys.argv.remove("--finer")
        finer()
    else:
        main()
