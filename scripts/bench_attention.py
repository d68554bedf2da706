"""Pallas vs XLA attention at production sequence lengths (VERDICT r1 item 9).

The ``impl="auto"`` threshold (seq >= 256 -> pallas) shipped in round 1 with
no measurement at CLIP ViT's 197 tokens.  This times both implementations on
the real chip with the tunnel's quirks neutralized: inputs generated
on-device from a fresh PRNG key each pass (no transfer, no program/input
dedup), a long sequential lax.scan so kernel time dominates dispatch
overhead, best-of-N full host round-trips.

Usage: python scripts/bench_attention.py [--iters 2000] [--passes 4]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from arp_tpu.ops.attention import dot_product_attention
from arp_tpu.ops.masks import MaskSpec

B, H, D = 64, 12, 64  # CLIP ViT-B/16 encode shapes (per-image heads/dims)


def build(impl, seq, iters, spec):
    @jax.jit
    def f(key):
        x = jax.random.normal(key, (B, seq, H, D), jnp.bfloat16)

        def body(x, _):
            o = dot_product_attention(x, x, x, spec=spec, impl=impl)
            return o.astype(jnp.bfloat16), ()

        out, _ = lax.scan(body, x, None, length=iters)
        return jnp.sum(out.astype(jnp.float32))

    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--passes", type=int, default=4)
    ap.add_argument("--seqs", type=int, nargs="*", default=[128, 197, 256, 512, 1024])
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    results = []
    for spec_name in ("none", "causal"):
        spec = MaskSpec(spec_name)
        for seq in args.seqs:
            row = {"mask": spec_name, "seq": seq, "iters": args.iters}
            for impl in ("xla", "pallas"):
                try:
                    f = build(impl, seq, args.iters, spec)
                    np.asarray(f(jax.random.PRNGKey(999)))  # compile
                    best = float("inf")
                    for p in range(args.passes):
                        t0 = time.time()
                        np.asarray(f(jax.random.PRNGKey(p)))
                        best = min(best, time.time() - t0)
                    flops = 4.0 * B * H * seq * seq * D * args.iters
                    if spec_name == "causal":
                        flops /= 2
                    row[impl] = round(best, 4)
                    row[f"{impl}_tflops"] = round(flops / best / 1e12, 2)
                except Exception as e:  # kernel may reject a shape
                    row[impl] = f"error: {type(e).__name__}"
            print(json.dumps(row), flush=True)
            results.append(row)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
