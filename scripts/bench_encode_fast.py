"""Measure the fast ViT encode path (ops/vit_infer.py) on the real chip.

Scan-amortized (see bench_encode.py).  Stages: the flax model path (baseline),
the packed bf16 fast path, and the static-int8 fast path, each at --batches.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_encode_fast.py
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
GFLOP_PER_FRAME = 35.1  # true fwd FLOPs (2/MAC), see bench_encode.py


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
    ap.add_argument("--batches", type=int, nargs="*", default=[256, 512])
    ap.add_argument("--skip-model", action="store_true")
    ap.add_argument("--out", type=str, default=None)
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

    results = []

    def record(stage, b, secs):
        row = {"stage": stage, "batch": b, "seconds": round(secs, 4),
               "fps": round(b * it / secs, 1),
               "tflops": round(b * it * GFLOP_PER_FRAME / secs / 1e3, 1)}
        results.append(row)
        print(json.dumps(row), flush=True)

    def scan_bench(name, b, fn, params):
        @jax.jit
        def run(key, _p=params, _b=b):
            def body(c, i):
                patches = jax.random.uniform(
                    jax.random.fold_in(key, i), (_b, N_PATCHES, PATCH * PATCH * 3), jnp.bfloat16
                )
                feat = fn(_p, patches)
                return c + jnp.sum(feat.astype(jnp.float32)), None

            c, _ = lax.scan(body, jnp.float32(0), jnp.arange(it))
            return c

        run(jax.random.PRNGKey(7))
        record(name, b, timed_best(run, args.passes, jax.random.PRNGKey))

    for b in args.batches:
        if not args.skip_model:
            scan_bench(
                f"model_bf16", b,
                lambda p, x: model.apply(p, x, normalize=False, method=model.encode_image),
                bf16_vars,
            )
        scan_bench("fast_bf16", b, lambda p, x: vit_encode(p, x, heads), packed)
        scan_bench("fast_int8", b, lambda p, x: vit_encode_int8(p, x, heads), qpacked)

    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
