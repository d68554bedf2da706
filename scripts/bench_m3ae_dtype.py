"""Probe: why the in-step frozen m3ae encoder underruns the CLIP engine.

Hypothesis (from the round-3 train-step bisect): the m3ae stack pins its
LayerNorms to fp32 (models/layers.py::Block), so compute_dtype=bfloat16
inserts a cast ping-pong around every LN and runs SLOWER than fp32
(measured 52.2 vs 63.4 TF/s encoder-only), while the dtype-polymorphic
CLIP tower under the engine's cast-the-whole-tree recipe reaches ~104 TF/s.

Legs, all at the train step's shapes (256 frames, 256x256, ViT-B/16-class,
scan-amortized per the tunnel measurement rules):

  clip_bf16    CLIP VisionTransformer, params cast to bf16 once (engine recipe)
  m3ae_f32     m3ae forward_representation, everything fp32 (trainer default)
  m3ae_bf16    m3ae with compute_dtype=bfloat16 (fp32-pinned LNs)

If clip_bf16 >> m3ae_f32 at identical shapes, the fix is a bf16-LN mode for
the frozen m3ae path, not more compiler work.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_m3ae_dtype.py
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

IMG, PATCH = 256, 16
NPATCH = (IMG // PATCH) ** 2
D, L, HEADS = 768, 12, 12
N = NPATCH + 1
# fwd GFLOPs per frame (2 FLOPs/MAC): transformer + patch embed
GF = (L * (24 * N * D * D + 4 * N * N * D) + 2 * NPATCH * (PATCH * PATCH * 3) * D) / 1e9


def scan_run(apply_fn, params, frames, steps, feature_shape):
    """Scan-amortized timing: fresh on-device PRNG input per iter, carried
    checksum, HOST FETCH per pass — on the axon tunnel block_until_ready
    returns before the program finishes; only a full host round-trip
    measures completion (scripts/_bench_common.py methodology)."""

    @jax.jit
    def run(p, key):
        def body(c, i):
            x = jax.random.uniform(
                jax.random.fold_in(key, i), (frames, NPATCH, PATCH * PATCH * 3), jnp.float32
            )
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--steps", type=int, default=16)
    args = ap.parse_args()

    from arp_tpu.models.clip.model import VisionTransformer
    from arp_tpu.models import m3ae as m3ae_lib
    from arp_tpu.models.policy.models import BERT_VOCAB_SIZE

    results = {}

    # --- clip tower, engine recipe (params bf16 once, dtype-polymorphic) ---
    vit = VisionTransformer(patch_size=PATCH, features=D, num_layers=L, num_heads=HEADS, out_features=None)
    params = jax.jit(lambda r: vit.init(r, jnp.zeros((1, NPATCH, PATCH * PATCH * 3), jnp.float32)))(
        jax.random.PRNGKey(0)
    )
    params_bf16 = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if jnp.issubdtype(p.dtype, jnp.floating) else p, params
    )

    def clip_apply(p, x):
        out, _ = vit.apply(p, x.astype(jnp.bfloat16))
        return out

    compile_s, best = scan_run(clip_apply, params_bf16, args.frames, args.steps, None)
    fps = args.frames * args.steps / best
    results["clip_bf16"] = fps
    print(f"clip_bf16   : compile {compile_s:.1f}s  {fps:8.0f} frames/s  {fps*GF/1e3:6.1f} TF/s")

    # --- m3ae, trainer configurations ---
    # m3ae_full_bf16 is the --model.frozen_bf16 recipe: params cast once +
    # bf16 LNs/residual stream (ln_dtype) — the engine recipe applied to m3ae.
    legs = (
        ("m3ae_f32", dict(compute_dtype="float32"), False),
        ("m3ae_bf16", dict(compute_dtype="bfloat16"), False),
        ("m3ae_full_bf16", dict(compute_dtype="bfloat16", ln_dtype="bfloat16"), True),
        # + bf16 attention scores/softmax: halves the (B, H, 257, 257) score
        # HBM traffic — the largest remaining byte term of the frozen forward
        # (--analyze roofline, docs/BENCHMARKS.md). Chip-dependent knob.
        (
            "m3ae_full_bf16_sm16",
            dict(compute_dtype="bfloat16", ln_dtype="bfloat16", score_dtype="bfloat16"),
            True,
        ),
    )
    mp = None
    for label, dts, cast_params in legs:
        model = m3ae_lib.MaskedMultimodalAutoencoder(
            config_updates=dict(model_type=m3ae_lib.M3AE_MODEL_CONFIGS["vit_b16"], **dts),
            text_vocab_size=BERT_VOCAB_SIZE,
        )
        if mp is None:
            mp = jax.jit(
                lambda r, _m=model: _m.init(
                    {"params": r}, jnp.zeros((1, NPATCH, PATCH * PATCH * 3), jnp.float32), None, None,
                    method=_m.forward_representation, deterministic=True,
                )
            )(jax.random.PRNGKey(0))
        p = mp
        if cast_params:
            p = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16) if jnp.issubdtype(a.dtype, jnp.floating) else a, mp
            )

        def m3ae_apply(p, x, _m=model):
            return _m.apply(p, x, None, None, method=_m.forward_representation, deterministic=True)

        compile_s, best = scan_run(m3ae_apply, p, args.frames, args.steps, None)
        fps = args.frames * args.steps / best
        results[label] = fps
        print(f"{label:15s}: compile {compile_s:.1f}s  {fps:8.0f} frames/s  {fps*GF/1e3:6.1f} TF/s")

    print({k: round(v) for k, v in results.items()})


if __name__ == "__main__":
    main()
