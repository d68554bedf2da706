"""Measured time attribution for the resident w8a8 encode (VERDICT r4 #3).

The round-4 claim "the remaining resident gap is LN statistics + softmax +
residual-stream traffic" was estimate-grade.  This script measures it by
ablation ON THE CHIP: the production program vs structurally-identical
variants with one non-matmul component removed at a time (same matmul
shapes, same dtypes, same scan-over-layers structure), timed with the
standard scan-amortized harness.  The deltas are the measured cost of each
component; `skeleton` (all non-matmul work removed) is the measured matmul
floor for this silicon + XLA schedule.

Variants:
  full        production vit_encode_int8(int8_attn=True, score_dtype=bf16)
  no_ln       LayerNorms replaced by affine scale+shift (no mean/var stats)
  no_softmax  softmax replaced by a constant-scale cast (no exp/normalize)
  skeleton    both removed: int8 matmuls + quantize/requant casts only

Caveat (stated in the docs table): each ablation compiles a different XLA
program, so fusion boundaries can shift; the deltas measure "component +
its fusion consequences", which is exactly the cost an optimization would
recover.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_resident_ablate.py \
           [--batch 128] [--iters 20] [--passes 4]
"""

import argparse
import json

import jax
import jax.numpy as jnp

from _bench_common import GFLOP_PER_FRAME, scan_encode_seconds, setup_vit_b16


def make_variant(num_heads: int, ln: bool, softmax: bool, int8_attn: bool = True):
    """Re-implementation of vit_encode_int8's xla body (ops/vit_infer.py)
    with LN / softmax individually removable; `ln=True, softmax=True`
    reproduces the production structure (parity asserted in main)."""
    from arp_tpu.ops.vit_infer import _attention_int8, _ln, _qmatmul

    cd = jnp.bfloat16

    def affine(x, scale, bias):
        # LN ablation: same output shape/dtype, no mean/var statistics
        return (x.astype(jnp.float32) * scale.astype(jnp.float32)
                + bias.astype(jnp.float32)).astype(cd)

    norm = _ln if ln else lambda x, s, b, dt: affine(x, s, b)

    def attention_nosoftmax(q, k, v, heads, a_in, score_dtype):
        # softmax ablation: the EXACT production dataflow/casts of
        # _attention_int8 (s32 -> f32*scale -> bf16 -> f32*127 -> int8) with
        # only the jax.nn.softmax call deleted.  An earlier version quantized
        # straight from the s32 scores (s // 128) — that variant measured
        # SLOWER than production (45 vs 27 ms: the s32 tensor moves at 4 bytes
        # through the requant region the bf16 softmax path covers at 2), i.e.
        # it ablated the layout, not the softmax.
        b, n, d = q.shape
        hd = d // heads
        inv = 127.0 / jnp.maximum(a_in, 1e-12)

        def q8(t):
            t = jnp.clip(jnp.round(t.astype(jnp.float32) * inv), -127, 127)
            return t.astype(jnp.int8).reshape(b, n, heads, hd)

        qi, ki, vi = q8(q), q8(k), q8(v)
        s = jnp.einsum("bqhd,bkhd->bhqk", qi, ki, preferred_element_type=jnp.int32)
        s_scale = (a_in / 127.0) ** 2 * hd**-0.5
        p = (s.astype(jnp.float32) * s_scale).astype(score_dtype)  # no exp/normalize
        p8 = jnp.round(p.astype(jnp.float32) * 127.0).astype(jnp.int8)
        o = jnp.einsum("bhqk,bkhd->bqhd", p8, vi, preferred_element_type=jnp.int32)
        o_scale = (1.0 / 127.0) * (a_in / 127.0)
        return (o.astype(jnp.float32) * o_scale).astype(cd).reshape(b, n, d)

    attn = _attention_int8 if softmax else attention_nosoftmax

    def encode(qpacked, patches):
        def site(y, a, wq, ws, bias, act="none"):
            out = _qmatmul(y, a, wq, ws, bias).astype(cd)
            if act == "quickgelu":
                out = out * jax.nn.sigmoid(jnp.bfloat16(1.702) * out)
            return out

        x = site(patches, qpacked["a_conv1"], qpacked["conv1_q"], qpacked["conv1_ws"], None)
        b = x.shape[0]
        cls = jnp.broadcast_to(qpacked["cls"].astype(cd), (b, 1, x.shape[-1]))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + qpacked["pos"][None, : x.shape[1]].astype(cd)
        x = norm(x, qpacked["ln_pre_s"], qpacked["ln_pre_b"], cd)

        def layer(x, L):
            y = norm(x, L["ln1_s"], L["ln1_b"], cd)
            qkv = site(y, L["a_qkv"], L["wqkv_q"], L["wqkv_ws"], L["bqkv"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            a = attn(q, k, v, num_heads, L["a_attn_in"], jnp.bfloat16)
            x = x + site(a, L["a_attn_out"], L["wout_q"], L["wout_ws"], L["bout"])
            y = norm(x, L["ln2_s"], L["ln2_b"], cd)
            h = site(y, L["a_fc"], L["wfc_q"], L["wfc_ws"], L["bfc"], act="quickgelu")
            x = x + site(h, L["a_proj"], L["wproj_q"], L["wproj_ws"], L["bproj"])
            return x, None

        x, _ = jax.lax.scan(layer, x, qpacked["layers"])
        feat = norm(x[:, 0], qpacked["ln_post_s"], qpacked["ln_post_b"], cd)
        return site(feat, qpacked["a_final"], qpacked["proj_q"], qpacked["proj_ws"], None).astype(jnp.float32)

    return encode


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--passes", type=int, default=4)
    p.add_argument("--out", default="docs/resident_ablation.json")
    args = p.parse_args()

    from arp_tpu.ops.vit_infer import vit_encode_int8

    model, variables, packed, qpacked, heads = setup_vit_b16(calibrate=True)
    B = args.batch

    # parity gate: the local "full-structure" re-implementation must match
    # the production program numerically, or the ablation measures a strawman
    import numpy as np

    probe = jax.random.uniform(jax.random.PRNGKey(3), (8, 196, 16 * 16 * 3), jnp.bfloat16)
    prod = jax.jit(lambda q, a: vit_encode_int8(q, a, heads, score_dtype=jnp.bfloat16, int8_attn=True))(qpacked, probe)
    local = jax.jit(make_variant(heads, ln=True, softmax=True))(qpacked, probe)
    cos = float(np.sum(np.asarray(prod) * np.asarray(local))
                / (np.linalg.norm(prod) * np.linalg.norm(local)))
    assert cos > 0.9999, f"re-implementation diverges from production (cos={cos})"

    variants = {
        "full": lambda q, a: vit_encode_int8(q, a, heads, score_dtype=jnp.bfloat16, int8_attn=True),
        "no_ln": make_variant(heads, ln=False, softmax=True),
        "no_softmax": make_variant(heads, ln=True, softmax=False),
        "skeleton": make_variant(heads, ln=False, softmax=False),
    }
    results = {"batch": B, "iters": args.iters, "backend": jax.default_backend(),
               "reimpl_cosine_vs_production": cos, "variants": {}}
    for name, fn in variants.items():
        sec = scan_encode_seconds(fn, qpacked, B, args.iters, args.passes)
        per_dispatch_ms = sec / args.iters * 1e3
        fps = B * args.iters / sec
        tfs = fps * GFLOP_PER_FRAME / 1e3
        results["variants"][name] = {"ms_per_dispatch": per_dispatch_ms, "fps": fps,
                                     "tf_per_s_equiv": tfs}
        print(f"{name:<12} {per_dispatch_ms:8.2f} ms/dispatch  {fps:8.0f} fps  {tfs:6.1f} TF/s-equiv")

    full = results["variants"]["full"]["ms_per_dispatch"]
    for name in ("no_ln", "no_softmax", "skeleton"):
        d = full - results["variants"][name]["ms_per_dispatch"]
        results["variants"][name]["saved_ms_vs_full"] = d
        print(f"{name:<12} saves {d:6.2f} ms vs full ({100 * d / full:.1f}%)")

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"written to {args.out}")


if __name__ == "__main__":
    main()
