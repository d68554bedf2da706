"""Train-step throughput benchmark on the real TPU chip.

Measures the flagship ARPDT configuration (reference jobs/train_procgen.sh:
87-93 — policy w/ DT mask + frozen m3ae ViT-B/16 encoder + adapter, window 4,
256x256 frames) as steps/sec and frames/sec for a *device-resident* batch:
the input batch lives in HBM and only the scalar loss is read back per step,
so the number reflects compute capability, not the dev tunnel's host->device
link (see docs/BENCHMARKS.md "tunnel behavior" — the link fluctuates ~5x and
is measured separately by the reward-labeling bisect).

Weights are random-init (throughput is weight-independent): the reference
m3ae checkpoint loader is monkeypatched to return a fresh init of the same
architecture, keeping the exact frozen-encoder (stop_gradient) path.

Variants:
  fp32        — default precision
  bf16        — --model.compute_dtype=bfloat16 on policy + m3ae blocks
  bf16_remat  — bf16 + per-block jax.checkpoint
  cached      — transfer_type=*_cached: precomputed embeddings, policy-only
                step (the non-encoder remainder of the fp32/bf16 step)
  encoder     — scan-amortized frozen m3ae forward alone at the train step's
                shapes (batch*window frames) — the encoder share of the step

``--analyze`` additionally prints XLA's compiled-program cost analysis
(FLOPs / bytes accessed) and the roofline bounds they imply next to the
measured time, attributing the step to compute vs HBM bandwidth.

Usage: python scripts/bench_train.py [--variant bf16] [--batch 64] [--steps 16]
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compile cache: one home for the policy (_bench_common configures
# it at import; tunnel compiles are ~5 min each; measurement is unaffected —
# timings follow explicit warmup).
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bench_common  # noqa: F401  (side effect: compile-cache config)

WINDOW = 4
IMG = 256
PATCH = 16


def fake_m3ae_loader(model_name, checkpoint_dir=None):
    """Random-init m3ae vars of the requested architecture (no pickle needed)."""
    from arp_tpu.models import m3ae as m3ae_lib
    from arp_tpu.models.policy.models import BERT_VOCAB_SIZE

    size = m3ae_lib.M3AE_MODEL_CONFIGS[model_name.replace("m3ae_", "")]
    model = m3ae_lib.MaskedMultimodalAutoencoder(
        config_updates=dict(model_type=size), text_vocab_size=BERT_VOCAB_SIZE
    )
    patch = jnp.zeros((1, (IMG // PATCH) ** 2, PATCH * PATCH * 3), jnp.float32)
    params = jax.jit(
        lambda r: model.init(
            {"params": r}, patch, None, None,
            method=model.forward_representation, deterministic=True,
        )
    )(jax.random.PRNGKey(0))
    return params


def bench_encoder_only(args):
    """Scan-amortized frozen m3ae forward alone, at the train step's shapes.

    ``--steps`` is the scan trip count; fresh on-device PRNG frames per
    iteration, carried checksum (the tunnel measurement rules from
    scripts/_bench_common.py).
    """
    from arp_tpu.models import m3ae as m3ae_lib
    from arp_tpu.models.policy.models import BERT_VOCAB_SIZE

    frames = args.batch * WINDOW
    npatch = (IMG // PATCH) ** 2
    n, d, L = npatch + 1, 768, 12
    gflop_per_frame = (L * (24 * n * d * d + 4 * n * n * d) + 2 * npatch * (PATCH * PATCH * 3) * d) / 1e9
    params = fake_m3ae_loader("m3ae_vit_b16")
    size = m3ae_lib.M3AE_MODEL_CONFIGS["vit_b16"]

    for dt in ("float32", "bfloat16"):
        model = m3ae_lib.MaskedMultimodalAutoencoder(
            config_updates=dict(model_type=size, compute_dtype=dt),
            text_vocab_size=BERT_VOCAB_SIZE,
        )

        @jax.jit
        def run(p, key, _model=model):
            # params MUST be a jit argument: closing over them embeds ~1 GB
            # of fp32 constants in the serialized HLO, and the tunnel's
            # remote_compile rejects the request body with HTTP 413
            def body(c, i):
                x = jax.random.uniform(
                    jax.random.fold_in(key, i), (frames, npatch, PATCH * PATCH * 3), jnp.float32
                )
                emb = _model.apply(
                    p, x, None, None,
                    method=_model.forward_representation, deterministic=True,
                )
                return c + jnp.sum(emb.astype(jnp.float32)), None

            c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(args.steps))
            return c

        t0 = time.time()
        run(params, jax.random.PRNGKey(7))
        print(f"[{dt}] compile: {time.time()-t0:.1f}s")
        best = float("inf")
        for p in range(3):
            t0 = time.time()
            _ = float(run(params, jax.random.PRNGKey(p)))
            best = min(best, time.time() - t0)
        fps = frames * args.steps / best
        print(
            f"encoder-only [{dt}]: {frames} frames/iter x {args.steps} iters, "
            f"best {best:.3f}s = {fps:.0f} frames/s "
            f"({fps * gflop_per_frame / 1e3:.1f} TF/s at {gflop_per_frame:.1f} GFLOP/frame fwd)"
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--variant", default="bf16",
        choices=["fp32", "bf16", "bf16_remat", "cached", "encoder", "frozen_bf16",
                 "frozen_sm16", "frozen_int8", "frozen_int8_sm16",
                 "frozen_int8_sm16_a8"],
    )
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--analyze", action="store_true",
                    help="print XLA cost analysis + roofline bounds for the step")
    args = ap.parse_args()

    if args.variant == "encoder":
        return bench_encoder_only(args)

    from arp_tpu.models import m3ae as m3ae_lib
    from arp_tpu.models.policy import ARPDT
    from arp_tpu.parallel import MeshConfig, create_mesh, make_train_step, shard_batch
    from arp_tpu.parallel.step import shard_train_state

    # the policy module imports this same module object, so one patch suffices
    m3ae_lib.load_m3ae_model_vars = fake_m3ae_loader

    # frozen_bf16: fp32 policy + full-bf16 frozen encoder (params cast once,
    # bf16 LNs/residuals) — the production recipe; see --model.frozen_bf16.
    # frozen_sm16: frozen_bf16 + bf16 attention scores/softmax on the frozen
    # encoder (--model.m3ae.score_dtype=bfloat16) — halves the (B, H, 257,
    # 257) score HBM traffic, the largest byte term of the step's roofline.
    # frozen_int8[_sm16]: the packed int8 m3ae forward (--model.frozen_int8,
    # ops/m3ae_infer.py), fp32 vs bf16 scores.
    frozen = args.variant.startswith(("frozen_bf16", "frozen_sm16", "frozen_int8"))
    int8 = args.variant.startswith("frozen_int8")
    dtype = "bfloat16" if args.variant in ("bf16", "bf16_remat") else "float32"
    cached = args.variant == "cached"
    m3ae_cfg = dict(model_type="base", compute_dtype=dtype, remat=args.variant == "bf16_remat")
    cfg = dict(
        model_type="vit_base",            # DT block mask; dims are explicit below
        transfer_type="m3ae_vit_b16_cached" if cached else "m3ae_vit_b16",
        emb_dim=128, depth=2, num_heads=8,  # reference CLI-effective policy dims
        use_discrete_action=True,
        use_adapter=True,
        num_ensembles=5,
        compute_dtype=dtype,
        frozen_bf16=frozen,
        remat=args.variant == "bf16_remat",
        m3ae=m3ae_cfg,
    )
    if frozen:
        # frozen_score_dtype (not the m3ae sub-key) controls the frozen-tower
        # score dtype: frozen_bf16 must stay the fp32-scores baseline even
        # though the config default is now bfloat16 (docs/BENCHMARKS.md's
        # 979-vs-1,386 f/s comparison reproduces only with this split)
        cfg["frozen_score_dtype"] = (
            "bfloat16"
            if args.variant in ("frozen_sm16", "frozen_int8_sm16", "frozen_int8_sm16_a8")
            else "float32"
        )
    if int8:
        cfg["frozen_int8"] = True
        # round-4 default is auto->true under frozen_int8; the plain int8
        # variants measure the bf16-attention recipe, _a8 the w8a8 winner
        # (measured 118 -> 86 ms/step, +36%)
        cfg["frozen_int8_attn"] = (
            "true" if args.variant == "frozen_int8_sm16_a8" else "false"
        )
    rng = np.random.default_rng(0)
    host_batch = {
        "rtg": {"ob": rng.random((args.batch, WINDOW, 1), np.float32)},
        "action": rng.integers(0, 15, size=(args.batch, WINDOW)).astype(np.int32),
        "goal": None,
        "instruct": None,
        "text_padding_mask": None,
    }
    if cached:
        # frozen-encoder embeddings precomputed by data/cache_embeddings.py:
        # the step is everything EXCEPT the encoder (policy fwd+bwd+adamw)
        host_batch["image_emb"] = {"ob": rng.random((args.batch, WINDOW, 768), np.float32)}
    else:
        host_batch["image"] = {"ob": rng.random((args.batch, WINDOW, IMG, IMG, 3), np.float32)}

    qpack = None
    if int8:
        # calibrate the packed int8 encoder on the bench frames themselves
        # (the bench feeds raw [0,1) floats with no in-step augmentation, so
        # these ARE the activation distribution the step will see)
        from arp_tpu.models.m3ae import extract_patches
        from arp_tpu.ops import m3ae_infer

        vars_ = fake_m3ae_loader("m3ae_vit_b16")
        frames = jnp.asarray(host_batch["image"]["ob"]).reshape((-1, IMG, IMG, 3))
        patch = extract_patches(frames, PATCH)
        t0 = time.time()
        qpack = m3ae_infer.build_m3ae_qpack(vars_, 12, 12, patch)
        print(f"int8 calibration: {time.time()-t0:.1f}s")

    model = ARPDT(config_updates=cfg, num_actions=15, patch_dim=PATCH, frozen_qpack=qpack)

    mesh = create_mesh(MeshConfig(dp=len(jax.devices())))
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    t0 = time.time()
    small = jax.tree_util.tree_map(
        lambda a: a[:2] if isinstance(a, np.ndarray) else a, host_batch
    )
    params = jax.jit(lambda r: model.init(r, small, deterministic=True))(rngs)["params"]
    print(f"init: {time.time()-t0:.1f}s  params={sum(p.size for p in jax.tree_util.tree_leaves(params)):,}")

    import optax
    from flax.training.train_state import TrainState

    state = TrainState.create(
        apply_fn=model.apply,
        params=params,
        tx=optax.chain(optax.clip_by_global_norm(10.0), optax.adamw(5e-4)),
    )

    def loss_fn(params, batch, step_rng):
        out = model.apply(
            {"params": params}, batch,
            rngs={"dropout": step_rng, "noise": jax.random.fold_in(step_rng, 1)},
            deterministic=False,
        )
        return out["loss"], {"acc": out["acc"]}

    with mesh:
        step = make_train_step(loss_fn, mesh, weight_decay=5e-5)
        gstate = shard_train_state(state, mesh)
        gbatch = shard_batch(host_batch, mesh)

        t0 = time.time()
        gstate, aux = step(gstate, gbatch, jax.random.PRNGKey(0))
        print(f"first step (compile): {time.time()-t0:.1f}s loss={float(aux['loss']):.3f}")

        flops = byts = None
        if args.analyze:
            ca = step.lower(gstate, gbatch, jax.random.PRNGKey(0)).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops, byts = ca.get("flops"), ca.get("bytes accessed")
            if flops and byts:
                # 197 TF/s applies to the fp32 variants too: JAX's DEFAULT
                # matmul precision runs fp32-input dots as single-pass bf16
                # MXU ops on TPU (the measured fp32==bf16 step times confirm
                # the programs really execute at the bf16 rate)
                print(
                    f"cost analysis: {flops/1e12:.2f} TFLOP, {byts/1e9:.2f} GB accessed per step\n"
                    f"  roofline floors: compute {flops/197e12*1e3:.0f} ms (197 TF/s bf16 MXU, "
                    f"default-precision fp32 dots included), "
                    f"bandwidth {byts/819e9*1e3:.0f} ms (819 GB/s HBM)"
                )

        # fresh rng per step; scalar loss readback forces completion
        times = []
        for i in range(args.steps):
            t0 = time.time()
            gstate, aux = step(gstate, gbatch, jax.random.PRNGKey(i + 1))
            _ = float(aux["loss"])
            times.append(time.time() - t0)
        best = min(times)
        med = sorted(times)[len(times) // 2]

        # steady-state: chain steps with async dispatch (the trainer reads
        # metrics every log_freq steps, not every step) — one readback at the
        # end forces the whole chain; amortizes per-step dispatch latency
        t0 = time.time()
        for i in range(args.steps):
            gstate, aux = step(gstate, gbatch, jax.random.PRNGKey(1000 + i))
        _ = float(aux["loss"])
        chained = (time.time() - t0) / args.steps

        frames = args.batch * WINDOW
        print(
            f"variant={args.variant} batch={args.batch} window={WINDOW} img={IMG}\n"
            f"per-step readback: best {best*1e3:.0f} ms ({frames/best:.0f} frames/s), "
            f"median {med*1e3:.0f} ms ({frames/med:.0f} frames/s)\n"
            f"chained (steady state): {chained*1e3:.0f} ms/step "
            f"({args.batch/chained:.1f} ex/s, {frames/chained:.0f} frames/s)"
        )
        if flops and byts:
            print(
                f"achieved: {flops/chained/1e12:.1f} TF/s, {byts/chained/1e9:.0f} GB/s "
                f"(of 197 TF/s / 819 GB/s v5e peaks)"
            )


if __name__ == "__main__":
    main()
