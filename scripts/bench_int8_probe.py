"""Probe int8 MXU viability for the fast ViT encode path (round 3).

All stages scan-amortized (fresh data via on-device PRNG, carried checksum).
FLOP convention: 2 FLOPs per MAC.

Stages:
  peak_bf16 / peak_int8      4096^3 matmul sustained rate
  mlp_bf16                   ViT-B MLP-shaped chain (50432x768 @ 768x3072 @ 3072x768)
  mlp_int8_static            same, int8 weights AND pre-quantized int8 activations
  mlp_int8_dynamic           same, with on-the-fly per-row activation quantization
"""

import argparse
import json
import time

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

M = 256 * 197  # ViT-B/16 batch-256 token rows
D, H = 768, 3072


from _bench_common import timed_best  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()
    it = args.iters

    def record(name, secs, flops):
        print(json.dumps({"stage": name, "seconds": round(secs, 4),
                          "tflops": round(flops / secs / 1e12, 1)}), flush=True)

    # --- square peaks ---
    S = 4096
    flops_sq = 2 * S * S * S * it

    @jax.jit
    def peak_bf16(key):
        a = jax.random.normal(key, (S, S), jnp.bfloat16)
        b = jax.random.normal(jax.random.fold_in(key, 1), (S, S), jnp.bfloat16)

        def body(c, _):
            o = jnp.dot(a + c.astype(jnp.bfloat16), b, preferred_element_type=jnp.float32)
            return jnp.max(o), None  # REAL carry: keeps the dot loop-variant

        c, _ = lax.scan(body, jnp.float32(0), jnp.arange(it))
        return c

    peak_bf16(jax.random.PRNGKey(0))
    record("peak_bf16", timed_best(peak_bf16, args.passes, jax.random.PRNGKey), flops_sq)

    @jax.jit
    def peak_int8(key):
        a = jax.random.randint(key, (S, S), -127, 127, jnp.int8)
        b = jax.random.randint(jax.random.fold_in(key, 1), (S, S), -127, 127, jnp.int8)

        def body(c, _):
            o = jnp.dot(a + c, b, preferred_element_type=jnp.int32)
            return (jnp.max(o) % 3).astype(jnp.int8), None

        c, _ = lax.scan(body, jnp.int8(0), jnp.arange(it))
        return c

    peak_int8(jax.random.PRNGKey(0))
    record("peak_int8", timed_best(peak_int8, args.passes, jax.random.PRNGKey), flops_sq)

    # --- ViT MLP-shaped chains ---
    flops_mlp = 2 * M * D * H * 2 * it

    @jax.jit
    def mlp_bf16(key):
        w1 = jax.random.normal(key, (D, H), jnp.bfloat16) * 0.02
        w2 = jax.random.normal(jax.random.fold_in(key, 1), (H, D), jnp.bfloat16) * 0.02

        def body(x, _):
            h = jnp.dot(x, w1, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            h = h * jax.nn.sigmoid(1.702 * h)
            o = jnp.dot(h, w2, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            return o, None

        x0 = jax.random.normal(jax.random.fold_in(key, 2), (M, D), jnp.bfloat16)
        x, _ = lax.scan(body, x0, jnp.arange(it))
        return jnp.sum(x.astype(jnp.float32))

    mlp_bf16(jax.random.PRNGKey(0))
    record("mlp_bf16", timed_best(mlp_bf16, args.passes, jax.random.PRNGKey), flops_mlp)

    @jax.jit
    def mlp_int8_static(key):
        w1 = jax.random.randint(key, (D, H), -127, 127, jnp.int8)
        w2 = jax.random.randint(jax.random.fold_in(key, 1), (H, D), -127, 127, jnp.int8)

        def body(x, _):
            h = jnp.dot(x, w1, preferred_element_type=jnp.int32)
            h = (h >> 8).astype(jnp.int8)
            o = jnp.dot(h, w2, preferred_element_type=jnp.int32)
            return (o >> 8).astype(jnp.int8), None

        x0 = jax.random.randint(jax.random.fold_in(key, 2), (M, D), -127, 127, jnp.int8)
        x, _ = lax.scan(body, x0, jnp.arange(it))
        return jnp.sum(x.astype(jnp.int32))

    mlp_int8_static(jax.random.PRNGKey(0))
    record("mlp_int8_static", timed_best(mlp_int8_static, args.passes, jax.random.PRNGKey), flops_mlp)

    @jax.jit
    def mlp_int8_dynamic(key):
        w1 = jax.random.randint(key, (D, H), -127, 127, jnp.int8)
        s1 = jnp.full((1, H), 0.01, jnp.float32)
        w2 = jax.random.randint(jax.random.fold_in(key, 1), (H, D), -127, 127, jnp.int8)
        s2 = jnp.full((1, D), 0.01, jnp.float32)

        def quant_rows(x):
            amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
            scale = jnp.maximum(amax, 1e-6) / 127.0
            q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
            return q, scale

        def body(x, _):
            q, xs = quant_rows(x)
            h = jnp.dot(q, w1, preferred_element_type=jnp.int32)
            h = h.astype(jnp.float32) * (xs * s1)
            h = (h * jax.nn.sigmoid(1.702 * h)).astype(jnp.bfloat16)
            q2, hs = quant_rows(h.astype(jnp.float32))
            o = jnp.dot(q2, w2, preferred_element_type=jnp.int32)
            o = o.astype(jnp.float32) * (hs * s2)
            return o.astype(jnp.bfloat16).astype(jnp.float32), None

        x0 = jax.random.normal(jax.random.fold_in(key, 2), (M, D), jnp.float32)
        x, _ = lax.scan(body, x0, jnp.arange(it))
        return jnp.sum(x)

    mlp_int8_dynamic(jax.random.PRNGKey(0))
    record("mlp_int8_dynamic", timed_best(mlp_int8_dynamic, args.passes, jax.random.PRNGKey), flops_mlp)


if __name__ == "__main__":
    main()
