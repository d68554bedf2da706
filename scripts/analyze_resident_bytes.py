"""Measured per-pass HBM-traffic table for the resident w8a8 encode (VERDICT r4 #3).

The round-4 writeup attributed the remaining resident gap (4.8k of 6k fps)
to "LN statistics + softmax + residual-stream traffic" — but that claim was
estimate-grade.  This script makes it measured: it compiles the exact
production program (``vit_encode_int8(int8_attn=True, score_dtype=bf16)``
on the ViT-B/16 tower at the headline batch) and walks the OPTIMIZED HLO's
entry computation.  Every top-level instruction's operand+output buffer
sizes are exact HBM traffic (fusion internals never touch HBM), so summing
them per category yields the program's true byte budget, cross-checked
against XLA's own ``cost_analysis()['bytes accessed']`` aggregate.

Categories (by fusion body content):
  matmul      — contains dot/convolution (weight + activation operands)
  softmax     — contains exponential (the (B,H,N,N) probability region)
  layernorm   — contains rsqrt (LN statistics + normalize)
  elementwise — everything else fused (residual adds, casts, quantize)
  other       — copies, parameters threading, etc.

Usage (compile-only; safe to run while the chip executes other jobs):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/analyze_resident_bytes.py [--batch 128]
"""

import argparse
import json
import re

import jax
import jax.numpy as jnp
import numpy as np

DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(type_str: str) -> int:
    """Total bytes of an HLO type string, incl. tuple types."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(type_str):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


_INSTR_RE = re.compile(r"^\s+(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\([^)]*\)|\S+)\s+(\w+)\(", re.M)


def classify(name: str, op: str, body: str) -> str:
    if op in ("dot", "convolution") or ".dot" in name or "convolution" in name:
        return "matmul"
    if op == "fusion":
        if "dot(" in body or "convolution(" in body:
            return "matmul"
        if "exponential(" in body:
            return "softmax"
        if "rsqrt(" in body:
            return "layernorm"
        return "elementwise"
    if op in ("parameter", "constant", "tuple", "get-tuple-element", "bitcast"):
        return "none"  # no fresh HBM traffic
    if op in ("copy", "copy-start", "copy-done", "transpose", "reshape"):
        return "other"
    return "elementwise" if op not in ("custom-call",) else "other"


def analyze(compiled, label: str) -> dict:
    hlo = compiled.as_text()
    # entry computation: from "ENTRY" to end of its closing brace
    entry = hlo[hlo.index("ENTRY"):]
    # map fusion name -> its computation body (for classification)
    bodies = {}
    for m in re.finditer(r"^%?([\w.\-]+)(?:\s+\([^)]*\))? \{$", hlo, re.M):
        start = m.end()
        end = hlo.find("\n}", start)
        bodies[m.group(1).lstrip("%")] = hlo[start:end]

    buckets = {}
    for m in _INSTR_RE.finditer(entry):
        name, out_type, op = m.group(1), m.group(2), m.group(3)
        line_end = entry.find("\n", m.start())
        line = entry[m.start():line_end]
        body = ""
        cm = re.search(r"(?:calls|to_apply)=%?([\w.\-]+)", line)
        if cm:
            body = bodies.get(cm.group(1), "")
        cat = classify(name, op, body)
        if cat == "none":
            continue
        out_b = shape_bytes(out_type)
        # operand bytes: parse the operand list's type annotations are absent
        # in HLO operand references, so look the operands' types up by name
        op_b = 0
        for ref in re.findall(r"%([\w.\-]+)", line[line.index("(") :]):
            dm = re.search(rf"^\s+(?:ROOT\s+)?%?{re.escape(ref)}\s*=\s*(\([^)]*\)|\S+)\s+\w+\(", entry, re.M)
            if dm:
                op_b += shape_bytes(dm.group(1))
        b = buckets.setdefault(cat, {"bytes": 0, "count": 0})
        b["bytes"] += out_b + op_b
        b["count"] += 1

    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    total = sum(v["bytes"] for v in buckets.values())
    return {
        "label": label,
        "buckets": buckets,
        "sum_bucket_bytes": total,
        "xla_bytes_accessed": float(ca.get("bytes accessed", 0.0)),
        "xla_flops": float(ca.get("flops", 0.0)),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--out", default="docs/resident_bytes.json")
    args = p.parse_args()

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
    B = args.batch
    x = jnp.zeros((B, n_patches, patch * patch * 3), jnp.bfloat16)

    packed = pack_vit_params(variables, model.vision_num_layers)
    calib = jax.jit(lambda p, a: calibrate_vit(p, a, heads))(packed, x[:32].astype(jnp.float32))
    qpacked = quantize_packed(packed, jax.tree_util.tree_map(np.asarray, calib))

    variants = {
        # the headline resident recipe (fast_int8 + sm16 + a8)
        "int8_sm16_a8": lambda: jax.jit(
            lambda q, a: vit_encode_int8(q, a, heads, score_dtype=jnp.bfloat16, int8_attn=True)
        ).lower(qpacked, x),
        "int8_sm16": lambda: jax.jit(
            lambda q, a: vit_encode_int8(q, a, heads, score_dtype=jnp.bfloat16, int8_attn=False)
        ).lower(qpacked, x),
        "bf16": lambda: jax.jit(
            lambda q, a: vit_encode(q, a, heads, compute_dtype=jnp.bfloat16)
        ).lower(packed, x),
    }
    results = {"batch": B, "backend": jax.default_backend(), "variants": {}}
    for name, lower in variants.items():
        compiled = lower().compile()
        r = analyze(compiled, name)
        results["variants"][name] = r
        print(f"\n== {name} (B={B}, {jax.default_backend()}) ==")
        print(f"{'category':<12}{'bytes/dispatch':>16}{'MB':>9}{'fusions':>9}")
        for cat, v in sorted(r["buckets"].items(), key=lambda kv: -kv[1]["bytes"]):
            print(f"{cat:<12}{v['bytes']:>16,}{v['bytes']/1e6:>9.1f}{v['count']:>9}")
        print(f"{'SUM':<12}{r['sum_bucket_bytes']:>16,}{r['sum_bucket_bytes']/1e6:>9.1f}")
        print(f"xla bytes-accessed aggregate: {r['xla_bytes_accessed']:,.0f} "
              f"({r['xla_bytes_accessed']/1e6:.1f} MB)  flops: {r['xla_flops']:.3e}")

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"\nwritten to {args.out}")


if __name__ == "__main__":
    main()
