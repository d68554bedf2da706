"""Compiled-program cost analysis of the ViT-B/16 encode variants.

Backs the round-3 perf conclusion (docs/BENCHMARKS.md) with XLA's own
numbers: per-variant FLOPs and bytes-accessed from
``jax.stages.Compiled.cost_analysis()``, and the arithmetic intensity
(FLOPs/byte) each program needs vs what the chip supplies
(v5e: ~197 bf16 TFLOP/s / ~394 int8 TOP/s against ~819 GB/s HBM ->
ridge at ~240 (bf16) / ~480 (int8) FLOPs/byte).  When a variant's
intensity sits below the ridge, HBM bandwidth — not the MXU — bounds it;
that is why int8's 2x matmul rate nets only +5% end to end.

Usage: PYTHONPATH=/root/repo[:/root/.axon_site] python scripts/analyze_encode_cost.py
"""

import json

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from arp_tpu.models.clip import CLIP, CONFIGS
    from arp_tpu.ops.vit_infer import (
        calibrate_vit, pack_vit_params, quantize_packed, vit_encode, vit_encode_int8,
    )

    cfg = dict(CONFIGS["vit_b16"])
    model = CLIP(**cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32),
    )
    heads = model.vision_features // 64
    patch = model.vision_patch_size
    n_patches = (224 // patch) ** 2
    B = 256
    x = jnp.zeros((B, n_patches, patch * patch * 3), jnp.bfloat16)

    bf16_vars = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if jnp.issubdtype(p.dtype, jnp.floating) else p,
        variables,
    )
    packed = pack_vit_params(variables, model.vision_num_layers)
    calib = jax.jit(lambda p, a: calibrate_vit(p, a, heads))(packed, x[:64].astype(jnp.float32))
    qpacked = quantize_packed(packed, jax.tree_util.tree_map(np.asarray, calib))

    variants = {
        "flax_bf16": (lambda p, a: model.apply(p, a, normalize=False, method=model.encode_image), bf16_vars),
        "fast_bf16": (lambda p, a: vit_encode(p, a, heads, compute_dtype=jnp.bfloat16), packed),
        "fast_int8": (lambda p, a: vit_encode_int8(p, a, heads), qpacked),
    }
    out = {}
    for name, (fn, params) in variants.items():
        compiled = jax.jit(fn).lower(params, x).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        bytes_acc = float(ca.get("bytes accessed", 0.0))
        out[name] = {
            "gflops_per_frame": round(flops / B / 1e9, 2),
            "mbytes_per_frame": round(bytes_acc / B / 1e6, 2),
            "flops_per_byte": round(flops / max(bytes_acc, 1.0), 1),
        }
    print(json.dumps({"backend": jax.default_backend(), "batch": B, "variants": out}, indent=1))


if __name__ == "__main__":
    main()
