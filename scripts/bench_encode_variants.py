"""Variant sweep for the fast ViT path: scan vs unroll, bf16 vs int8.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_encode_variants.py --variants fast_bf16_unroll fast_int8 fast_int8_unroll --batches 256
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from arp_tpu.models.clip import CLIP, CONFIGS
from arp_tpu.ops.vit_infer import calibrate_vit, pack_vit_params, quantize_packed, vit_encode, vit_encode_int8

IMG, PATCH = 224, 16
N_PATCHES = (IMG // PATCH) ** 2
GFLOP = 35.1


def timed_best(fn, passes, make_arg):
    best = float("inf")
    for p in range(passes):
        a = make_arg(p)
        t0 = time.time()
        np.asarray(fn(a))
        best = min(best, time.time() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--batches", type=int, nargs="*", default=[256])
    ap.add_argument("--variants", nargs="*", default=["fast_bf16_unroll", "fast_int8_unroll"])
    args = ap.parse_args()
    it = args.iters

    cfg = CONFIGS["vit_b16"]
    model = CLIP(**cfg)
    heads = cfg["vision_features"] // 64
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3), jnp.float32), jnp.zeros((1, 77), jnp.int32)
    )
    packed = pack_vit_params(variables, cfg["vision_num_layers"])
    calib = jax.jit(lambda p, x: calibrate_vit(p, x, heads))(
        packed, jax.random.normal(jax.random.PRNGKey(3), (64, N_PATCHES, PATCH * PATCH * 3), jnp.float32)
    )
    qpacked = quantize_packed(packed, jax.tree_util.tree_map(np.asarray, calib))
    bf16_vars = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if jnp.issubdtype(p.dtype, jnp.floating) else p, variables
    )

    FNS = {
        "fast_bf16": (lambda p, x: vit_encode(p, x, heads), packed),
        "fast_bf16_unroll": (lambda p, x: vit_encode(p, x, heads, unroll=True), packed),
        "fast_int8": (lambda p, x: vit_encode_int8(p, x, heads), qpacked),
        "fast_int8_unroll": (lambda p, x: vit_encode_int8(p, x, heads, unroll=True), qpacked),
        "fast_int8_pallas": (lambda p, x: vit_encode_int8(p, x, heads, impl="pallas"), qpacked),
        "fast_int8_pallas_unroll": (lambda p, x: vit_encode_int8(p, x, heads, impl="pallas", unroll=True), qpacked),
        "fast_int8_sm16": (lambda p, x: vit_encode_int8(p, x, heads, score_dtype=jnp.bfloat16), qpacked),
        "fast_bf16_sm16": (lambda p, x: vit_encode(p, x, heads, score_dtype=jnp.bfloat16), packed),
        "model_bf16": (lambda p, x: model.apply(p, x, normalize=False, method=model.encode_image), bf16_vars),
    }

    for b in args.batches:
        for name in args.variants:
            fn, params = FNS[name]

            @jax.jit
            def run(key, _p=params, _b=b, _fn=fn):
                def body(c, i):
                    x = jax.random.uniform(
                        jax.random.fold_in(key, i), (_b, N_PATCHES, PATCH * PATCH * 3), jnp.bfloat16
                    )
                    return c + jnp.sum(_fn(_p, x).astype(jnp.float32)), None

                c, _ = lax.scan(body, jnp.float32(0), jnp.arange(it))
                return c

            run(jax.random.PRNGKey(7))
            secs = timed_best(run, args.passes, jax.random.PRNGKey)
            print(json.dumps({"stage": name, "batch": b, "seconds": round(secs, 4),
                              "fps": round(b * it / secs, 1),
                              "tflops": round(b * it * GFLOP / secs / 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()
