"""Int8 weight-only quantization for serving-grade inference.

Per-output-channel symmetric int8 quantization of dense kernels, with a
Pallas TPU kernel that dequantizes tiles in VMEM on the way into the MXU
(pallas guide quantization pattern) and an XLA fallback.  Halves (vs bf16) or
quarters (vs f32) the weight HBM traffic of frozen encoders — the dominant
bytes for small-batch serving.

API:
  quantize_array(w)            -> (int8 values, f32 per-column scales)
  dequantize_array(q, scales)  -> f32
  int8_matmul(x, q, scales)    -> x @ dequantize(q)  (pallas on TPU)
  quantize_tree(params)        -> quantize every 2-D kernel in a pytree
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def quantize_array(w: jnp.ndarray, axis: int = 0):
    """Symmetric per-channel int8 quantization along ``axis`` (contraction dim).

    For a (K, N) dense kernel, scales are per output column (axis=0 reduces K).
    """
    absmax = jnp.max(jnp.abs(w), axis=axis, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def dequantize_array(q: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return q.astype(jnp.float32) * scale


def _int8_matmul_kernel(x_ref, q_ref, scale_ref, o_ref):
    # tiles: x (bm, K), q (K, bn) int8, scale (1, bn)
    w = q_ref[:].astype(jnp.float32) * scale_ref[:]
    o_ref[:] = jnp.dot(
        x_ref[:].astype(jnp.float32), w, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def int8_matmul(x: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray, block_m: int = 128, block_n: int = 128):
    """x @ dequant(q, scale); x: (M, K) float, q: (K, N) int8, scale: (1, N).

    On TPU runs as a Pallas kernel (weights stream HBM->VMEM as int8 and
    dequantize per tile); elsewhere falls back to a fused XLA expression.
    """
    if jax.default_backend() != "tpu":
        return x @ dequantize_array(q, scale).astype(x.dtype)

    m, k = x.shape
    _, n = q.shape
    mp = -(-m // block_m) * block_m
    np_ = -(-n // block_n) * block_n
    x_pad = jnp.pad(x, ((0, mp - m), (0, 0)))
    q_pad = jnp.pad(q, ((0, 0), (0, np_ - n)))
    s_pad = jnp.pad(scale, ((0, 0), (0, np_ - n)))

    out = pl.pallas_call(
        _int8_matmul_kernel,
        grid=(mp // block_m, np_ // block_n),
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
    )(x_pad, q_pad, s_pad)
    return out[:m, :n]


def quantize_tree(params, min_size: int = 1024):
    """Quantize every 2-D 'kernel' leaf in a param pytree.

    Returns (quantized_tree, apply_fn) where quantized leaves become dicts
    {"q": int8, "scale": f32} and ``apply_fn(tree)`` dequantizes back to the
    original structure (for consumers without a fused int8 path).
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    quantized_paths = []
    for path, leaf in flat:
        name = str(path[-1].key) if hasattr(path[-1], "key") else ""
        if name == "kernel" and getattr(leaf, "ndim", 0) == 2 and leaf.size >= min_size:
            q, scale = quantize_array(leaf, axis=0)
            out.append({"q": q, "scale": scale})
            quantized_paths.append(path)
        else:
            out.append(leaf)
    qtree = jax.tree_util.tree_unflatten(treedef, out)

    def dequantize_tree(tree):
        def fix(leaf):
            if isinstance(leaf, dict) and set(leaf) == {"q", "scale"}:
                return dequantize_array(leaf["q"], leaf["scale"])
            return leaf

        return jax.tree_util.tree_map(
            fix, tree, is_leaf=lambda l: isinstance(l, dict) and set(l) == {"q", "scale"}
        )

    return qtree, dequantize_tree


def quantization_error(w: jnp.ndarray) -> float:
    """Relative fro-norm error of int8 round-trip (diagnostic)."""
    q, s = quantize_array(w)
    back = dequantize_array(q, s)
    return float(jnp.linalg.norm(back - w) / jnp.maximum(jnp.linalg.norm(w), 1e-12))
