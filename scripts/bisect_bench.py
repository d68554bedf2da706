"""Per-stage bisect of the CLIP reward-labeling pipeline on the real chip.

VERDICT.md round-1 item 2: publish a per-stage table through the same
ClipRewardEngine pipeline (fresh inputs, best-of-N) so the ~250 fps e2e vs
~2900 fps isolated-encode gap is attributed to a stage instead of asserted
to be "tunnel overhead".

Stages (all timed as full host round-trips — scalar fetch forces the work;
see docs/BENCHMARKS.md profiling notes on why nothing else is trustworthy):

  transfer   device_put of the packed uint8 chunk + trivial jit sum
  resize     transfer + bit-exact packed PIL resize (3x bf16 matmul passes)
  preprocess transfer + resize + normalize + patchify
  full       the actual engine text_rewards path (transfer+preprocess+encode)
  encode     device-resident patches (fresh via on-device PRNG) -> ViT encode

Usage: python scripts/bisect_bench.py [--passes 3] [--out FILE]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from _bench_common import timed_best as timed  # noqa: E402

from arp_tpu.models.clip import CLIP, CONFIGS
from arp_tpu.ops.preprocess import clip_preprocess_packed_patches, resize_bicubic_pil_packed
from arp_tpu.reward.engine import ClipRewardEngine

SRC = 256  # source frame side (Procgen highres)
IMG = 224




def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--batches", type=int, nargs="*", default=[256])
    ap.add_argument("--full-batches", type=int, nargs="*", default=[128, 256, 512])
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    model = CLIP(**CONFIGS["vit_b16"])
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3), jnp.float32), jnp.zeros((1, 77), jnp.int32)
    )
    bf16_vars = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if jnp.issubdtype(p.dtype, jnp.floating) else p, variables
    )

    results = []

    def record(stage, b, secs):
        row = {"stage": stage, "batch": b, "seconds": round(secs, 4), "fps": round(b / secs, 1)}
        results.append(row)
        print(json.dumps(row), flush=True)

    def fresh_packed(b):
        def make(p):
            arr = rng.integers(0, 256, size=(b, SRC, SRC * 3), dtype=np.uint8)
            return arr

        return make

    for b in args.batches:
        # --- transfer only ---
        @jax.jit
        def sum_only(x):
            return jnp.sum(x, dtype=jnp.int32)

        f = lambda x: sum_only(jax.device_put(x))
        f(fresh_packed(b)(99))  # compile
        record("transfer", b, timed(f, args.passes, fresh_packed(b)))

        # --- transfer + resize ---
        @jax.jit
        def resize_sum(x):
            r = resize_bicubic_pil_packed(x.astype(jnp.float32), 3, IMG, IMG)
            return jnp.sum(r)

        f = lambda x: resize_sum(jax.device_put(x))
        f(fresh_packed(b)(99))
        record("resize", b, timed(f, args.passes, fresh_packed(b)))

        # --- transfer + preprocess (resize+normalize+patchify) ---
        @jax.jit
        def preprocess_sum(x):
            patches = clip_preprocess_packed_patches(x, channels=3, image_size=IMG, patch_size=16)
            return jnp.sum(patches)

        f = lambda x: preprocess_sum(jax.device_put(x))
        f(fresh_packed(b)(99))
        record("preprocess", b, timed(f, args.passes, fresh_packed(b)))

        # --- encode only: fresh device-resident patches -> ViT (bf16) ---
        # scan-amortized (r3): a single dispatch bundles ~20 ms of tunnel RPC
        # latency into the number (that artifact produced r2's low reading)
        n_patches = (IMG // 16) ** 2
        iters = 16

        @jax.jit
        def encode_only(variables, key):
            def body(c, i):
                patches = jax.random.uniform(
                    jax.random.fold_in(key, i), (b, n_patches, 16 * 16 * 3), jnp.bfloat16
                )
                feat = model.apply(variables, patches, normalize=False, method=model.encode_image)
                return c + jnp.sum(feat.astype(jnp.float32)), None

            c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
            return c

        f = lambda k: encode_only(bf16_vars, k)
        f(jax.random.PRNGKey(1234))
        secs = timed(f, args.passes, lambda p: jax.random.PRNGKey(p)) / iters
        record("encode_resident", b, secs)

    # --- full engine path at several batch sizes ---
    for b in args.full_batches:
        engine = ClipRewardEngine(
            model=model, variables=variables, batch_size=b, resize_mode="pil",
            compute_dtype=jnp.bfloat16, image_size=IMG,
        )
        tokens = np.zeros((1, 77), np.int32)
        tokens[0, :3] = [49406, 320, 49407]

        def make(p):
            return rng.integers(0, 256, size=(b, SRC, SRC, 3), dtype=np.uint8)

        f = lambda frames: engine.text_rewards(frames, tokens)
        f(make(99))
        record("full_engine", b, timed(f, args.passes, make))

    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
