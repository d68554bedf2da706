"""Shared measurement harness for the encode benchmark scripts.

Methodology (docs/BENCHMARKS.md profiling notes): on the axon tunnel only a
full host round-trip measures completion, identical (program, input) pairs
can be served from a backend cache, and single dispatches carry ~20 ms of RPC
latency — so every benchmark here (a) fetches a scalar to host, (b) uses
fresh inputs per pass, and (c) amortizes dispatch over a lax.scan of
``iters`` kernel invocations with on-device PRNG inputs.

FLOP convention: 2 FLOPs per MAC (ViT-B/16 @224 = 35.1 GFLOP/frame).
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# Persistent compile cache (same store bench.py uses): the tunnel's ~5-min
# ViT-sized compiles dominate these scripts' wall time, and variant sweeps
# re-run the same programs across invocations.  Measurement is unaffected —
# every timing follows an explicit compile/warmup call.
_cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

IMG, PATCH = 224, 16
N_PATCHES = (IMG // PATCH) ** 2
GFLOP_PER_FRAME = 35.1


def timed_best(fn, passes, make_arg):
    """Best-of-N seconds; fresh input per pass; host fetch forces completion."""
    best = float("inf")
    for p in range(passes):
        a = make_arg(p)
        t0 = time.time()
        np.asarray(fn(a))
        best = min(best, time.time() - t0)
    return best


def scan_encode_seconds(fn, params, batch, iters, passes):
    """Scan-amortized encode timing: ``fn(params, patches)`` over fresh
    on-device PRNG patch batches, checksum carried so nothing is DCE'd."""

    @jax.jit
    def run(key):
        def body(c, i):
            x = jax.random.uniform(
                jax.random.fold_in(key, i), (batch, N_PATCHES, PATCH * PATCH * 3), jnp.bfloat16
            )
            return c + jnp.sum(fn(params, x).astype(jnp.float32)), None

        c, _ = lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return c

    run(jax.random.PRNGKey(7))  # compile
    return timed_best(run, passes, jax.random.PRNGKey)


def setup_vit_b16(calibrate: bool = True):
    """Random-init ViT-B/16 + packed (bf16) and int8-calibrated packs."""
    from arp_tpu.models.clip import CLIP, CONFIGS
    from arp_tpu.ops.vit_infer import calibrate_vit, pack_vit_params, quantize_packed

    cfg = CONFIGS["vit_b16"]
    model = CLIP(**cfg)
    heads = cfg["vision_features"] // 64
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3), jnp.float32), jnp.zeros((1, 77), jnp.int32)
    )
    packed = pack_vit_params(variables, cfg["vision_num_layers"])
    qpacked = None
    if calibrate:
        calib = jax.jit(lambda p, x: calibrate_vit(p, x, heads))(
            packed,
            jax.random.normal(jax.random.PRNGKey(3), (64, N_PATCHES, PATCH * PATCH * 3), jnp.float32),
        )
        qpacked = quantize_packed(packed, jax.tree_util.tree_map(np.asarray, calib))
    return model, variables, packed, qpacked, heads
