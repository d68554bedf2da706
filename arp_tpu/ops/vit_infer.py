"""Speed-of-light ViT encode path for frozen-CLIP inference (round 3).

The flax CLIP model (models/clip/model.py) is the readable, trainable
reference implementation; this module is the serving path the reward engine
uses for bulk encoding (reference semantics: arp_dt/label_reward.py:123-230 —
unchanged, only faster).  Differences that buy throughput on the MXU:

  * params repacked once: per-layer trees stacked into (L, ...) arrays and the
    q/k/v projections fused into one (D, 3D) matmul — one MXU call instead of
    three thin ones; the 12-layer stack runs as a ``lax.scan`` (fast compiles,
    identical math);
  * everything bf16 except LN statistics and attention softmax (fp32);
  * optional **int8 mode**: weights per-output-channel int8, activations
    quantized with STATIC per-site scales calibrated once on real frames.
    Measured on the v5e (scripts/bench_int8_probe.py): ViT-MLP-shaped chains
    run 159 TF/s in bf16, 267 TF/s with static int8, but only 162 TF/s with
    dynamic per-row quantization — the amax reductions cost the entire int8
    gain, hence static calibration.  int8*int8->int32 hits the MXU's double
    rate natively through XLA (no custom kernel needed).

Full-model results at B=256 (scan-amortized, interleaved stability runs,
docs/BENCHMARKS.md round-3 section): flax default path 2,957 fps; this
module's int8 mode **3,114 fps (+5.3%)** — the theoretical 2x matmul gain is
mostly consumed by the bandwidth-bound LN/quantize/softmax passes between
matmuls, which dominate once matmuls shrink.  The bf16 packed mode and the
pallas fused kernel (`fused_int8_matmul`) measured BELOW the XLA paths on
this chip (2,510 / 2,162 fps) and remain available for hardware where the
balance differs (impl="pallas", score_dtype options).

Accuracy: the fp32 mode is oracle-exact vs the flax model (parity test);
bf16/int8 accuracy is bounded by cosine-similarity tests and the engine's
reward-MAE tests (tests/test_vit_infer.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

LN_EPS = 1e-5  # torch CLIP LayerNorm epsilon


def _ln(x, scale, bias, out_dtype, eps=LN_EPS):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.square(xf - mu).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(out_dtype)


def _ln_quant(x, scale, bias, a_scale, eps=LN_EPS):
    """LayerNorm with the int8 activation quantization folded into the
    epilogue: emits int8 directly, so no intermediate bf16 LN output is ever
    materialized between the LN and the quantize pass (the two were separate
    HBM round-trips in the round-3 int8 path — ops/vit_infer.py:44-49 +
    _qmatmul's quantize, flagged by VERDICT r3 as the int8 ceiling)."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.square(xf - mu).mean(-1, keepdims=True)
    inv = 127.0 / jnp.maximum(a_scale, 1e-12)
    # fold the quant scale into the LN affine: round((y*s + b) * inv)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    q = y * (scale.astype(jnp.float32) * inv) + bias.astype(jnp.float32) * inv
    return jnp.clip(jnp.round(q), -127, 127).astype(jnp.int8)


def pack_vit_params(variables, num_layers: int, dtype=jnp.bfloat16) -> dict:
    """Repack flax CLIP visual params into stacked, fused arrays.

    Returns a pytree of device arrays; weights cast to ``dtype`` (LN params
    stay f32 — they are consumed inside the f32 statistics epilogue).
    """
    p = variables["params"]["visual"]
    blocks = p["transformer"]

    def stack(fn):
        return jnp.stack([jnp.asarray(fn(blocks[f"resblocks.{i}"])) for i in range(num_layers)])

    def w(x):
        return jnp.asarray(x, dtype)

    layers = {
        "ln1_s": stack(lambda b: b["ln_1"]["scale"]).astype(jnp.float32),
        "ln1_b": stack(lambda b: b["ln_1"]["bias"]).astype(jnp.float32),
        "wqkv": stack(
            lambda b: np.concatenate(
                [np.asarray(b["attn"][k]["kernel"]) for k in ("query", "key", "value")], axis=1
            )
        ).astype(dtype),
        "bqkv": stack(
            lambda b: np.concatenate(
                [np.asarray(b["attn"][k]["bias"]) for k in ("query", "key", "value")], axis=0
            )
        ).astype(jnp.float32),
        "wout": stack(lambda b: b["attn"]["out"]["kernel"]).astype(dtype),
        "bout": stack(lambda b: b["attn"]["out"]["bias"]).astype(jnp.float32),
        "ln2_s": stack(lambda b: b["ln_2"]["scale"]).astype(jnp.float32),
        "ln2_b": stack(lambda b: b["ln_2"]["bias"]).astype(jnp.float32),
        "wfc": stack(lambda b: b["mlp"]["c_fc"]["kernel"]).astype(dtype),
        "bfc": stack(lambda b: b["mlp"]["c_fc"]["bias"]).astype(jnp.float32),
        "wproj": stack(lambda b: b["mlp"]["c_proj"]["kernel"]).astype(dtype),
        "bproj": stack(lambda b: b["mlp"]["c_proj"]["bias"]).astype(jnp.float32),
    }
    return {
        "conv1": w(p["conv1"]["kernel"]),
        "cls": w(p["class_embedding"]),
        "pos": w(p["positional_embedding"]),
        "ln_pre_s": jnp.asarray(p["ln_pre"]["scale"], jnp.float32),
        "ln_pre_b": jnp.asarray(p["ln_pre"]["bias"], jnp.float32),
        "ln_post_s": jnp.asarray(p["ln_post"]["scale"], jnp.float32),
        "ln_post_b": jnp.asarray(p["ln_post"]["bias"], jnp.float32),
        "proj": w(p["proj"]["kernel"]),
        "layers": layers,
    }


def _attention(q, k, v, num_heads, score_dtype=jnp.float32, kv_padding=None):
    """(B, N, D) fused attention; softmax in ``score_dtype`` (fp32 default).

    ``score_dtype=bfloat16`` halves the HBM traffic of the (B, H, N, N)
    score/probability tensors — the right trade for bulk inference (scores
    are max-subtracted before exp, so bf16's ~3 significant digits bound the
    softmax weight error at ~1e-3; accuracy covered by the cosine tests).

    ``kv_padding``: optional (B, N) array, nonzero = PAD key masked out (the
    m3ae text path; same -1e30 fill as ops/attention.py so bf16 stays finite).
    """
    b, n, d = q.shape
    hd = d // num_heads
    split = lambda t: t.reshape(b, n, num_heads, hd)
    q, k, v = split(q), split(k), split(v)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=score_dtype)
    s = s * jnp.asarray(hd**-0.5, score_dtype)
    if kv_padding is not None:
        pad = (kv_padding != 0)[:, None, None, :]  # (B, 1, 1, N) over keys
        s = jnp.where(pad, jnp.asarray(-1e30, score_dtype), s)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v)
    return out.reshape(b, n, d)


def _attention_int8(q, k, v, num_heads, a_in, score_dtype=jnp.bfloat16,
                    kv_padding=None):
    """w8a8 attention: int8 QK^T and P@V with static scales (round-4 lever).

    ``a_in`` is one calibrated amax covering q/k/v (they come out of the same
    fused qkv matmul, site ``attn_in``).  Both attention matmuls run
    int8xint8->int32 on the MXU (double rate) and, more importantly for this
    bandwidth-bound program, the (B, H, N, N) probability tensor and the
    q/k/v operands move through HBM at half/quarter width.  The probability
    quantization scale is static by construction (softmax output is in
    [0, 1], so scale = 1/127 exactly); only q/k/v need calibration.
    Accuracy is bounded by the cosine tests (tests/test_vit_infer.py) and
    the engine reward-MAE tests, same regime as the body matmuls.
    """
    b, n, d = q.shape
    hd = d // num_heads
    inv = 127.0 / jnp.maximum(a_in, 1e-12)

    def q8(t):
        t = jnp.clip(jnp.round(t.astype(jnp.float32) * inv), -127, 127)
        return t.astype(jnp.int8).reshape(b, n, num_heads, hd)

    qi, ki, vi = q8(q), q8(k), q8(v)
    s = jnp.einsum("bqhd,bkhd->bhqk", qi, ki, preferred_element_type=jnp.int32)
    s_scale = (a_in / 127.0) ** 2 * hd**-0.5
    s = (s.astype(jnp.float32) * s_scale).astype(score_dtype)
    if kv_padding is not None:
        pad = (kv_padding != 0)[:, None, None, :]  # (B, 1, 1, N) over keys
        s = jnp.where(pad, jnp.asarray(-1e30, score_dtype), s)
    p = jax.nn.softmax(s, axis=-1)
    p8 = jnp.round(p.astype(jnp.float32) * 127.0).astype(jnp.int8)  # probs in [0, 1]
    out = jnp.einsum("bhqk,bkhd->bqhd", p8, vi, preferred_element_type=jnp.int32)
    out = out.astype(jnp.float32) * ((a_in / 127.0) / 127.0)
    return out.reshape(b, n, d).astype(jnp.bfloat16)


def _unstack(layers):
    n = int(jax.tree_util.tree_leaves(layers)[0].shape[0])  # static under jit
    return [jax.tree_util.tree_map(lambda a, _i=i: a[_i], layers) for i in range(n)]


def vit_encode(packed, patches, num_heads: int, compute_dtype=jnp.bfloat16, unroll: bool = False,
               score_dtype=jnp.float32, return_intermediates: bool = False):
    """Forward pass over pre-patchified inputs (B, N, P*P*C) -> (B, embed_dim).

    ``compute_dtype=float32`` is oracle-exact vs the flax model; bfloat16 is
    the production mode.  ``unroll=True`` trades compile time for an unrolled
    layer loop (lets XLA specialize/pipeline across layers).
    ``return_intermediates=True`` additionally returns the per-layer CLS
    tokens as (L, B, D) f32 — what the multiscale adapter consumes
    (finetune/adapter_model.py; flax equivalent: capture_intermediates).
    """
    cd = compute_dtype
    x = patches.astype(cd) @ packed["conv1"].astype(cd)
    b = x.shape[0]
    cls = jnp.broadcast_to(packed["cls"].astype(cd), (b, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + packed["pos"][None, : x.shape[1]].astype(cd)
    x = _ln(x, packed["ln_pre_s"], packed["ln_pre_b"], cd)

    def layer(x, L):
        y = _ln(x, L["ln1_s"], L["ln1_b"], cd)
        qkv = (y @ L["wqkv"].astype(cd)).astype(jnp.float32) + L["bqkv"]
        q, k, v = jnp.split(qkv.astype(cd), 3, axis=-1)
        a = _attention(q, k, v, num_heads, score_dtype)
        x = x + ((a @ L["wout"].astype(cd)).astype(jnp.float32) + L["bout"]).astype(cd)
        y = _ln(x, L["ln2_s"], L["ln2_b"], cd)
        h = ((y @ L["wfc"].astype(cd)).astype(jnp.float32) + L["bfc"]).astype(cd)
        h = h * jax.nn.sigmoid(jnp.float32(1.702).astype(cd) * h)
        x = x + ((h @ L["wproj"].astype(cd)).astype(jnp.float32) + L["bproj"]).astype(cd)
        return x, x[:, 0].astype(jnp.float32)

    if unroll:
        inter = []
        for L in _unstack(packed["layers"]):
            x, cls_i = layer(x, L)
            inter.append(cls_i)
        inter = jnp.stack(inter) if inter else jnp.zeros((0,) + x[:, 0].shape, jnp.float32)
    else:
        x, inter = jax.lax.scan(layer, x, packed["layers"])
    feat = _ln(x[:, 0], packed["ln_post_s"], packed["ln_post_b"], cd)
    out = (feat @ packed["proj"].astype(cd)).astype(jnp.float32)
    if return_intermediates:
        return out, inter
    return out


# --- int8 static-scale mode ---------------------------------------------------


def calibrate_vit(packed, patches, num_heads: int):
    """Run the bf16 forward collecting per-site absolute maxima.

    Returns {"conv1": scalar, "final": scalar, "layers": {site: (L,)}} with
    sites qkv/attn_out/fc/proj — the inputs of each int8 matmul.

    KEEP IN LOCKSTEP with :func:`vit_encode`'s layer body: the amax sites
    must see exactly the activations the int8 forward will quantize, so any
    change to the forward's math or dtypes must be mirrored here (the
    int8-accuracy tests only weakly detect drift through cosine loss).
    """
    cd = jnp.bfloat16
    x = patches.astype(cd)
    amax_conv = jnp.max(jnp.abs(x.astype(jnp.float32)))
    x = x @ packed["conv1"].astype(cd)
    b = x.shape[0]
    cls = jnp.broadcast_to(packed["cls"].astype(cd), (b, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + packed["pos"][None, : x.shape[1]].astype(cd)
    x = _ln(x, packed["ln_pre_s"], packed["ln_pre_b"], cd)

    def layer(x, L):
        y = _ln(x, L["ln1_s"], L["ln1_b"], cd)
        a_qkv = jnp.max(jnp.abs(y.astype(jnp.float32)))
        qkv = (y @ L["wqkv"].astype(cd)).astype(jnp.float32) + L["bqkv"]
        a_attn_in = jnp.max(jnp.abs(qkv))  # q/k/v operand scale (int8_attn)
        q, k, v = jnp.split(qkv.astype(cd), 3, axis=-1)
        a = _attention(q, k, v, num_heads)
        a_out = jnp.max(jnp.abs(a.astype(jnp.float32)))
        x = x + ((a @ L["wout"].astype(cd)).astype(jnp.float32) + L["bout"]).astype(cd)
        y = _ln(x, L["ln2_s"], L["ln2_b"], cd)
        a_fc = jnp.max(jnp.abs(y.astype(jnp.float32)))
        h = ((y @ L["wfc"].astype(cd)).astype(jnp.float32) + L["bfc"]).astype(cd)
        h = h * jax.nn.sigmoid(jnp.float32(1.702).astype(cd) * h)
        a_proj = jnp.max(jnp.abs(h.astype(jnp.float32)))
        x = x + ((h @ L["wproj"].astype(cd)).astype(jnp.float32) + L["bproj"]).astype(cd)
        return x, {"qkv": a_qkv, "attn_in": a_attn_in, "attn_out": a_out,
                   "fc": a_fc, "proj": a_proj}

    x, site_amax = jax.lax.scan(layer, x, packed["layers"])
    feat = _ln(x[:, 0], packed["ln_post_s"], packed["ln_post_b"], cd)
    return {"conv1": amax_conv, "final": jnp.max(jnp.abs(feat.astype(jnp.float32))), "layers": site_amax}


def _quant_w(w):
    """Per-output-channel symmetric int8: (..., K, N) -> int8 + (..., 1, N) f32 scales."""
    from .quantization import quantize_array  # single home for the int8 math

    return quantize_array(jnp.asarray(w, jnp.float32), axis=-2)


def quantize_packed(packed, amax, margin: float = 1.05) -> dict:
    """Turn a bf16 pack + calibration amaxes into the int8 pack."""
    L = packed["layers"]
    qpack = dict(packed)
    layers = dict(L)
    for site, wname in (("qkv", "wqkv"), ("attn_out", "wout"), ("fc", "wfc"), ("proj", "wproj")):
        q, ws = _quant_w(L[wname])
        layers[wname + "_q"] = q
        layers[wname + "_ws"] = ws
        layers.pop(wname)
        layers["a_" + site] = jnp.asarray(amax["layers"][site], jnp.float32) * margin
    if "attn_in" in amax["layers"]:  # absent in packs calibrated before round 4
        layers["a_attn_in"] = jnp.asarray(amax["layers"]["attn_in"], jnp.float32) * margin
    qpack["layers"] = layers
    q, ws = _quant_w(packed["conv1"])
    qpack.update(conv1_q=q, conv1_ws=ws, a_conv1=jnp.asarray(amax["conv1"], jnp.float32) * margin)
    q, ws = _quant_w(packed["proj"])
    qpack.update(proj_q=q, proj_ws=ws, a_final=jnp.asarray(amax["final"], jnp.float32) * margin)
    for k in ("conv1", "proj"):
        qpack.pop(k)
    return qpack


def fused_int8_matmul(
    x,
    a_scale,
    wq,
    w_scale,
    bias=None,
    act: str = "none",
    block_m: int = 256,
    interpret: bool = False,
):
    """Pallas TPU kernel: quantize-on-the-fly int8 matmul with fused epilogue.

    x: (M, K) bf16/f32; a_scale: () f32 static activation scale; wq: (K, N)
    int8 (per-column scales w_scale (1, N) f32); bias (1, N) f32 or None;
    act: "none" | "quickgelu" fused into the epilogue.  Returns (M, N) bf16.

    Design (pallas guide quantization pattern): the WHOLE weight matrix stays
    resident in VMEM (ViT-B tiles are <=9.4 MB int8) and the grid walks M
    only — x is read once, the int32 accumulator never leaves registers/VMEM,
    and the epilogue (scale + bias + activation) writes bf16 directly.  This
    is what XLA cannot be relied on to do: its int32 dot output may
    materialize to HBM before the convert/scale epilogue.
    """
    from jax.experimental import pallas as pl

    m, k = x.shape
    kk, n = wq.shape
    assert k == kk
    mp = -(-m // block_m) * block_m
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    a = jnp.reshape(a_scale.astype(jnp.float32), (1, 1))
    b = jnp.zeros((1, n), jnp.float32) if bias is None else jnp.reshape(bias, (1, n)).astype(jnp.float32)

    def kern(x_ref, a_ref, w_ref, ws_ref, b_ref, o_ref):
        inv = 127.0 / jnp.maximum(a_ref[0, 0], 1e-12)
        q = jnp.clip(jnp.round(x_ref[...].astype(jnp.float32) * inv), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            q, w_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        out = acc.astype(jnp.float32) * (ws_ref[...] * (a_ref[0, 0] / 127.0)) + b_ref[...]
        if act == "quickgelu":
            out = out * jax.nn.sigmoid(1.702 * out)
        o_ref[...] = out.astype(o_ref.dtype)

    out = pl.pallas_call(
        kern,
        grid=(mp // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i: (i, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.bfloat16),
        interpret=interpret,
    )(x, a, wq, w_scale.astype(jnp.float32), b)
    return out[:m]


def _qmatmul(y, a_scale, wq, w_scale, bias=None):
    """Static-scale int8 matmul: bf16 activations -> int8 -> MXU int8 dot.

    y: (..., K) any float; a_scale: scalar f32; wq: (K, N) int8;
    w_scale: (1, N) f32.  Returns f32 (..., N).
    """
    inv = 127.0 / jnp.maximum(a_scale, 1e-12)
    q = jnp.clip(jnp.round(y.astype(jnp.float32) * inv), -127, 127).astype(jnp.int8)
    acc = jnp.matmul(q, wq, preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (w_scale * (a_scale / 127.0))
    if bias is not None:
        out = out + bias
    return out


def vit_encode_int8(
    qpacked,
    patches,
    num_heads: int,
    unroll: bool = False,
    impl: str = "xla",
    interpret: bool = False,
    score_dtype=jnp.float32,
    return_intermediates: bool = False,
    fuse_quant: bool = False,
    int8_attn: bool = False,
):
    """int8 forward (static activation scales); attention + LN stay bf16/f32.

    ``impl="pallas"`` routes every int8 matmul through
    :func:`fused_int8_matmul` (quantize + int8 MXU dot + scale/bias/gelu
    epilogue in one kernel, weights VMEM-resident); ``"xla"`` uses plain
    jnp ops and lets XLA schedule.  ``int8_attn=True`` additionally runs the
    two attention matmuls w8a8 (:func:`_attention_int8`) — requires a pack
    calibrated with the ``attn_in`` site.
    """
    cd = jnp.bfloat16
    L = qpacked["layers"]
    if int8_attn and "a_attn_in" not in L:
        raise ValueError(
            "int8_attn needs the 'attn_in' calibration site — recalibrate "
            "this pack with calibrate_vit (round-4+) before quantize_packed")

    def site(y, a, wq, ws, bias, act="none"):
        if impl == "pallas":
            lead = y.shape[:-1]
            out = fused_int8_matmul(
                y.reshape(-1, y.shape[-1]), a, wq, ws, bias, act=act, interpret=interpret
            )
            return out.reshape(*lead, out.shape[-1])
        out = _qmatmul(y, a, wq, ws, bias).astype(cd)
        if act == "quickgelu":
            out = out * jax.nn.sigmoid(jnp.bfloat16(1.702) * out)
        return out

    def qmat8(q8, a_scale, wq, ws, bias):
        # pre-quantized input variant of _qmatmul (fp32 epilogue)
        acc = jnp.matmul(q8, wq, preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * (ws * (a_scale / 127.0))
        return out if bias is None else out + bias

    def quant8(y, a_scale):
        inv = 127.0 / jnp.maximum(a_scale, 1e-12)
        return jnp.clip(jnp.round(y.astype(jnp.float32) * inv), -127, 127).astype(jnp.int8)

    x = site(patches, qpacked["a_conv1"], qpacked["conv1_q"], qpacked["conv1_ws"], None)
    b = x.shape[0]
    cls = jnp.broadcast_to(qpacked["cls"].astype(cd), (b, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + qpacked["pos"][None, : x.shape[1]].astype(cd)
    x = _ln(x, qpacked["ln_pre_s"], qpacked["ln_pre_b"], cd)

    def layer(x, L):
        # fuse_quant=True folds the int8 activation quantization into the
        # LN / gelu epilogues (explicit int8 tensors between matmuls, fp32
        # epilogues).  Hypothesis from VERDICT r3 (fp32 LN/quant passes as
        # the int8 ceiling) — MEASURED SLOWER than the default body on the
        # v5e at every batch (b128: 3,926 vs 4,140 fps, bench_encode_variants
        # fast_int8_sm16[_nofuse], round 4): XLA already fuses the LN->
        # quantize chain into the int8 dot, and the hand-written int8
        # round-trip blocks its better schedule.  Kept as an A/B knob; the
        # default (False) is the winner: LN -> bf16 -> quantize-in-matmul.
        # The pallas impl keeps its quantize-in-kernel structure either way.
        if impl == "pallas" or not fuse_quant:
            y = _ln(x, L["ln1_s"], L["ln1_b"], cd)
            qkv = site(y, L["a_qkv"], L["wqkv_q"], L["wqkv_ws"], L["bqkv"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            if int8_attn:
                a = _attention_int8(q, k, v, num_heads, L["a_attn_in"], score_dtype)
            else:
                a = _attention(q, k, v, num_heads, score_dtype)
            x = x + site(a, L["a_attn_out"], L["wout_q"], L["wout_ws"], L["bout"])
            y = _ln(x, L["ln2_s"], L["ln2_b"], cd)
            h = site(y, L["a_fc"], L["wfc_q"], L["wfc_ws"], L["bfc"], act="quickgelu")
            x = x + site(h, L["a_proj"], L["wproj_q"], L["wproj_ws"], L["bproj"])
            return x, x[:, 0].astype(jnp.float32)
        q8 = _ln_quant(x, L["ln1_s"], L["ln1_b"], L["a_qkv"])
        qkv = qmat8(q8, L["a_qkv"], L["wqkv_q"], L["wqkv_ws"], L["bqkv"]).astype(cd)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if int8_attn:
            a = _attention_int8(q, k, v, num_heads, L["a_attn_in"], score_dtype)
        else:
            a = _attention(q, k, v, num_heads, score_dtype)
        a8 = quant8(a, L["a_attn_out"])
        x = x + qmat8(a8, L["a_attn_out"], L["wout_q"], L["wout_ws"], L["bout"]).astype(cd)
        q8 = _ln_quant(x, L["ln2_s"], L["ln2_b"], L["a_fc"])
        h = qmat8(q8, L["a_fc"], L["wfc_q"], L["wfc_ws"], L["bfc"])
        h = h * jax.nn.sigmoid(1.702 * h)  # fp32 quickgelu epilogue
        h8 = quant8(h, L["a_proj"])
        x = x + qmat8(h8, L["a_proj"], L["wproj_q"], L["wproj_ws"], L["bproj"]).astype(cd)
        return x, x[:, 0].astype(jnp.float32)

    if unroll:
        inter = []
        for Li in _unstack(L):
            x, cls_i = layer(x, Li)
            inter.append(cls_i)
        inter = jnp.stack(inter) if inter else jnp.zeros((0,) + x[:, 0].shape, jnp.float32)
    else:
        x, inter = jax.lax.scan(layer, x, L)
    feat = _ln(x[:, 0], qpacked["ln_post_s"], qpacked["ln_post_b"], cd)
    out = site(feat, qpacked["a_final"], qpacked["proj_q"], qpacked["proj_ws"], None).astype(jnp.float32)
    if return_intermediates:
        return out, inter
    return out
