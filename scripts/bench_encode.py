"""Scan-amortized ViT encode benchmark on the real chip.

Round-3 perf work (VERDICT.md item 1): the bisect's ``encode_resident`` stage
times ONE dispatch through the axon tunnel, which bundles RPC latency into the
number.  This script amortizes dispatch over a ``lax.scan`` of ``--iters``
encodes (fresh on-device PRNG patches per iteration, scalar checksum carried
so nothing is DCE'd), giving the true device-resident throughput — the same
methodology as scripts/bench_attention.py.

Also probes raw MXU peaks (bf16 and int8->int32 matmul) so encode MFU can be
stated against what this chip actually sustains, not the datasheet.

FLOP convention: 1 MAC = 2 FLOPs (so ViT-B/16 @224 is ~35 GFLOP/frame, not
the 17.6 "GFLOPs"=GMACs figure common in papers).

Usage: python scripts/bench_encode.py [--iters 16] [--passes 3] [--out FILE]
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

from arp_tpu.models.clip import CLIP, CONFIGS

IMG = 224
PATCH = 16
N_PATCHES = (IMG // PATCH) ** 2  # 196


def vit_flops(cfg, n_tokens):
    """True forward FLOPs/frame (matmuls only, 2 FLOPs per MAC)."""
    d = cfg["vision_features"]
    L = cfg["vision_num_layers"]
    patch_dim = PATCH * PATCH * 3
    f = 2 * (n_tokens - 1) * patch_dim * d  # patch embed
    f += L * (2 * 12 * d * d * n_tokens + 2 * 2 * n_tokens * n_tokens * d)
    f += 2 * d * cfg["embed_dim"]  # final proj
    return f


from _bench_common import timed_best  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--batches", type=int, nargs="*", default=[256, 1024])
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--skip-peaks", action="store_true")
    args = ap.parse_args()

    results = []

    def record(name, secs, work_flops, frames=None):
        row = {"stage": name, "seconds": round(secs, 4),
               "tflops": round(work_flops / secs / 1e12, 1)}
        if frames is not None:
            row["fps"] = round(frames / secs, 1)
        results.append(row)
        print(json.dumps(row), flush=True)

    it = args.iters

    if not args.skip_peaks:
        # --- raw matmul peaks (what the chip sustains through a scan) ---
        M = K = N = 4096
        flops_mm = 2 * M * K * N * it

        @jax.jit
        def peak_bf16(key):
            a = jax.random.normal(key, (M, K), jnp.bfloat16)
            b = jax.random.normal(jax.random.fold_in(key, 1), (K, N), jnp.bfloat16)

            def body(c, i):
                o = jnp.dot(a + c.astype(jnp.bfloat16), b, preferred_element_type=jnp.float32)
                return jnp.max(o), None

            c, _ = lax.scan(body, jnp.float32(0), jnp.arange(it))
            return c

        peak_bf16(jax.random.PRNGKey(0))
        record("peak_bf16_matmul", timed_best(peak_bf16, args.passes, jax.random.PRNGKey), flops_mm)

        @jax.jit
        def peak_int8(key):
            a = jax.random.randint(key, (M, K), -127, 127, jnp.int8)
            b = jax.random.randint(jax.random.fold_in(key, 1), (K, N), -127, 127, jnp.int8)

            def body(c, i):
                o = jnp.dot((a + c.astype(jnp.int8)), b, preferred_element_type=jnp.int32)
                return jnp.max(o).astype(jnp.int8), None

            c, _ = lax.scan(body, jnp.int8(0), jnp.arange(it))
            return c

        peak_int8(jax.random.PRNGKey(0))
        record("peak_int8_matmul", timed_best(peak_int8, args.passes, jax.random.PRNGKey), flops_mm)

    # --- scan-amortized ViT-B/16 encode, current model path, bf16 ---
    cfg = CONFIGS["vit_b16"]
    model = CLIP(**cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3), jnp.float32), jnp.zeros((1, 77), jnp.int32)
    )
    bf16_vars = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if jnp.issubdtype(p.dtype, jnp.floating) else p, variables
    )
    fpf = vit_flops(cfg, N_PATCHES + 1)
    print(json.dumps({"note": "vit_b16 true fwd", "gflop_per_frame": round(fpf / 1e9, 1)}), flush=True)

    from _bench_common import scan_encode_seconds

    for b in args.batches:
        secs = scan_encode_seconds(
            lambda v, x: model.apply(v, x, normalize=False, method=model.encode_image),
            bf16_vars, b, it, args.passes,
        )
        record(f"encode_scan_b{b}", secs, fpf * b * it, frames=b * it)

    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
