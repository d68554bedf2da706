"""Variant sweep for the fast ViT path: scan vs unroll, bf16 vs int8, impls.

Subsumes the former bench_encode_fast.py (model_bf16 is one of the variants).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_encode_variants.py \
         --variants fast_int8 model_bf16 --batches 256
"""

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _bench_common import GFLOP_PER_FRAME, scan_encode_seconds, setup_vit_b16

from arp_tpu.ops.vit_infer import vit_encode, vit_encode_int8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--batches", type=int, nargs="*", default=[256])
    ap.add_argument("--variants", nargs="*", default=["fast_int8", "model_bf16"])
    args = ap.parse_args()

    model, variables, packed, qpacked, heads = setup_vit_b16()
    bf16_vars = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if jnp.issubdtype(p.dtype, jnp.floating) else p, variables
    )

    FNS = {
        "model_bf16": (lambda p, x: model.apply(p, x, normalize=False, method=model.encode_image), bf16_vars),
        "fast_bf16": (lambda p, x: vit_encode(p, x, heads), packed),
        "fast_bf16_unroll": (lambda p, x: vit_encode(p, x, heads, unroll=True), packed),
        "fast_bf16_sm16": (lambda p, x: vit_encode(p, x, heads, score_dtype=jnp.bfloat16), packed),
        "fast_int8": (lambda p, x: vit_encode_int8(p, x, heads), qpacked),
        "fast_int8_unroll": (lambda p, x: vit_encode_int8(p, x, heads, unroll=True), qpacked),
        "fast_int8_sm16": (lambda p, x: vit_encode_int8(p, x, heads, score_dtype=jnp.bfloat16), qpacked),
        # w8a8 attention I/O: int8 QK^T and P@V with static scales — the one
        # untried lever from the round-4 roofline writeup (halves the
        # (B,H,N,N) probability traffic and the q/k/v operand width)
        "fast_int8_sm16_a8": (
            lambda p, x: vit_encode_int8(p, x, heads, score_dtype=jnp.bfloat16, int8_attn=True),
            qpacked),
        # fused-quant body (int8 quantization folded into LN/GELU epilogues):
        # A/B for the fuse_quant knob — measured SLOWER than the default at
        # every batch (b128: 3,926 vs 4,140 fps, round-4 series)
        "fast_int8_sm16_fuse": (
            lambda p, x: vit_encode_int8(p, x, heads, score_dtype=jnp.bfloat16, fuse_quant=True),
            qpacked),
        "fast_int8_pallas": (lambda p, x: vit_encode_int8(p, x, heads, impl="pallas"), qpacked),
        "fast_int8_pallas_unroll": (
            lambda p, x: vit_encode_int8(p, x, heads, impl="pallas", unroll=True), qpacked),
    }

    for b in args.batches:
        for name in args.variants:
            fn, params = FNS[name]
            secs = scan_encode_seconds(fn, params, b, args.iters, args.passes)
            print(json.dumps({
                "stage": name, "batch": b, "seconds": round(secs, 4),
                "fps": round(b * args.iters / secs, 1),
                "tflops": round(b * args.iters * GFLOP_PER_FRAME / secs / 1e3, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
