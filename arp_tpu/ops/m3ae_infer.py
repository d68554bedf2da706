"""Speed-of-light packed forward for the FROZEN m3ae/mae encoder (round 4).

The flax m3ae (models/m3ae.py) is the readable, trainable implementation;
this module is the fast inference path for the *frozen* encoder tower inside
the policy train step (reference semantics: arp_dt/ARPDT.py:338,451-458 —
the reference re-encodes every frame on every step; so do we, just faster).
It is the m3ae equivalent of ops/vit_infer.py and shares its machinery:

  * params repacked once into stacked (L, ...) arrays with the q/k/v
    projection consumed as one fused (D, 3D) matmul; the layer stack runs as
    a ``lax.scan`` (fast compiles, identical math);
  * bf16 everywhere except LN statistics and (configurably) the attention
    softmax;
  * optional **int8 mode** with STATIC per-site activation scales calibrated
    once on real frames — and, new in round 4, the activation quantization
    folded into the LayerNorm / GELU epilogues (``vit_infer._ln_quant``), so
    the int8 path never materializes a bf16 LN or GELU output tensor between
    matmuls (VERDICT r3: those fp32/bf16 passes were the int8 ceiling).

Supported encoder entry points (exact token layouts of models/m3ae.py):

  * image-only  ``forward_representation(patch, None, None)``   [cls, img]
  * image+text  ``forward_representation(patch, ids, pad)``     [cls, img, txt]
  * goal-joint  ``forward_gc_representations(patch, goal)``     [cls, img, goal]

Accuracy: fp32 mode is oracle-exact vs the flax module (parity tests in
tests/test_m3ae_infer.py); bf16/int8 accuracy is bounded by cosine tests and
the policy-level frozen_int8 parity test.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import get_1d_sincos_pos_embed, get_2d_sincos_pos_embed
from .vit_infer import (
    _attention,
    _attention_int8,
    _ln,
    _ln_quant,
    _qmatmul,
    _quant_w,
    _unstack,
)

LN_EPS = 1e-6  # flax nn.LayerNorm default (models/layers.py uses it unchanged)


def pack_m3ae_params(variables, depth: int, dtype=jnp.bfloat16) -> dict:
    """Repack converted m3ae/mae params into stacked, fused arrays.

    Works for both MaskedMultimodalAutoencoder and MaskedAutoencoder trees
    (the latter simply lacks text/type embeddings).  Weights cast to
    ``dtype``; LN params and biases stay fp32 (consumed inside fp32
    epilogues).
    """
    p = variables["params"] if "params" in variables else variables
    enc = p["encoder"]

    def stack(fn):
        return jnp.stack([jnp.asarray(fn(enc[f"blocks_{i}"])) for i in range(depth)])

    layers = {
        "ln1_s": stack(lambda b: b["norm1"]["scale"]).astype(jnp.float32),
        "ln1_b": stack(lambda b: b["norm1"]["bias"]).astype(jnp.float32),
        "wqkv": stack(lambda b: b["attn"]["qkv"]["kernel"]).astype(dtype),
        "bqkv": stack(lambda b: b["attn"]["qkv"]["bias"]).astype(jnp.float32),
        "wout": stack(lambda b: b["attn"]["attn_out"]["kernel"]).astype(dtype),
        "bout": stack(lambda b: b["attn"]["attn_out"]["bias"]).astype(jnp.float32),
        "ln2_s": stack(lambda b: b["norm2"]["scale"]).astype(jnp.float32),
        "ln2_b": stack(lambda b: b["norm2"]["bias"]).astype(jnp.float32),
        "wfc": stack(lambda b: b["mlp"]["fc1"]["kernel"]).astype(dtype),
        "bfc": stack(lambda b: b["mlp"]["fc1"]["bias"]).astype(jnp.float32),
        "wproj": stack(lambda b: b["mlp"]["fc2"]["kernel"]).astype(dtype),
        "bproj": stack(lambda b: b["mlp"]["fc2"]["bias"]).astype(jnp.float32),
    }
    packed = {
        "img_w": jnp.asarray(p["image_embedding"]["kernel"], dtype),
        "img_b": jnp.asarray(p["image_embedding"]["bias"], jnp.float32),
        "cls": jnp.asarray(p["cls_token"], dtype),
        "ln_f_s": jnp.asarray(enc["norm"]["scale"], jnp.float32),
        "ln_f_b": jnp.asarray(enc["norm"]["bias"], jnp.float32),
        "layers": layers,
    }
    if "encoder_image_type_embedding" in p:
        packed["type_img"] = jnp.asarray(p["encoder_image_type_embedding"], dtype)
    if "encoder_text_type_embedding" in p:
        packed["type_txt"] = jnp.asarray(p["encoder_text_type_embedding"], dtype)
    if "text_embedding" in p:
        packed["text_emb"] = jnp.asarray(p["text_embedding"]["embedding"], dtype)
    return packed


def _embed_image_tokens(packed, patch, cd, quantized: bool = False):
    """patch (B, N, P*P*C) -> (B, N, D) image tokens (dense + 2d pos + type)."""
    if quantized:
        from .vit_infer import _qmatmul

        x = _qmatmul(patch, packed["a_img"], packed["img_w_q"], packed["img_w_ws"],
                     packed["img_b"]).astype(cd)
    else:
        x = ((patch.astype(cd) @ packed["img_w"].astype(cd)).astype(jnp.float32)
             + packed["img_b"]).astype(cd)
    emb_dim = x.shape[-1]
    x = x + get_2d_sincos_pos_embed(emb_dim, x.shape[1]).astype(cd)
    if "type_img" in packed:
        x = x + packed["type_img"].astype(cd)
    return x


def _embed_text_tokens(packed, text_ids, cd):
    """text ids (B, T) -> (B, T, D) text tokens (lookup + 1d pos + type)."""
    x = jnp.take(packed["text_emb"], text_ids, axis=0).astype(cd)
    emb_dim = x.shape[-1]
    x = x + get_1d_sincos_pos_embed(emb_dim, x.shape[1]).astype(cd)
    if "type_txt" in packed:
        x = x + packed["type_txt"].astype(cd)
    return x


def _token_stream(packed, patch, text_ids, text_padding_mask, goal_patch, cd,
                  quantized: bool = False):
    """Build the encoder input exactly as models/m3ae.py does.

    Returns (x, kv_padding) — kv_padding is None unless text is present
    (image-only / goal-joint encodes never pad, and models/m3ae.py:267-271
    deliberately passes no mask there so XLA skips the combine).
    """
    b = patch.shape[0]
    emb = _embed_image_tokens(packed, patch, cd, quantized)
    cls = jnp.broadcast_to(packed["cls"].astype(cd), (b, 1, emb.shape[-1]))
    parts = [cls, emb]
    pad = None
    if goal_patch is not None:
        assert text_ids is None, "goal-joint encode takes no text (m3ae.py:274-281)"
        parts.append(_embed_image_tokens(packed, goal_patch, cd, quantized))
    if text_ids is not None:
        parts.append(_embed_text_tokens(packed, text_ids, cd))
        zeros = jnp.zeros((b, 1 + emb.shape[1]), jnp.float32)
        pad = jnp.concatenate([zeros, text_padding_mask.astype(jnp.float32)], axis=1)
    return jnp.concatenate(parts, axis=1), pad


def m3ae_encode(
    packed,
    patch,
    num_heads: int,
    text_ids=None,
    text_padding_mask=None,
    goal_patch=None,
    compute_dtype=jnp.bfloat16,
    score_dtype=jnp.float32,
    return_intermediates: bool = False,
    unroll: bool = False,
):
    """Packed forward over pre-patchified inputs -> (B, N_total, D) fp32 tokens.

    ``compute_dtype=float32`` is oracle-exact vs the flax module (parity
    test); bfloat16 is the production frozen-tower mode.  With
    ``return_intermediates`` also returns the per-layer block outputs
    (L, B, N, D) in the residual dtype — what ``use_intermediate`` consumes
    (flax equivalent: the sowed ``intermediate_layer_i``).
    """
    cd = compute_dtype
    x, pad = _token_stream(packed, patch, text_ids, text_padding_mask, goal_patch, cd)

    def layer(x, L):
        y = _ln(x, L["ln1_s"], L["ln1_b"], cd, eps=LN_EPS)
        qkv = ((y @ L["wqkv"].astype(cd)).astype(jnp.float32) + L["bqkv"]).astype(cd)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        a = _attention(q, k, v, num_heads, score_dtype, kv_padding=pad)
        x = x + ((a @ L["wout"].astype(cd)).astype(jnp.float32) + L["bout"]).astype(cd)
        y = _ln(x, L["ln2_s"], L["ln2_b"], cd, eps=LN_EPS)
        h = ((y @ L["wfc"].astype(cd)).astype(jnp.float32) + L["bfc"])
        h = jax.nn.gelu(h, approximate=True).astype(cd)
        x = x + ((h @ L["wproj"].astype(cd)).astype(jnp.float32) + L["bproj"]).astype(cd)
        return x, x

    if unroll:
        inter = []
        for L in _unstack(packed["layers"]):
            x, _ = layer(x, L)
            inter.append(x)
        inter = jnp.stack(inter)
    else:
        x, inter = jax.lax.scan(layer, x, packed["layers"])
    out = _ln(x, packed["ln_f_s"], packed["ln_f_b"], jnp.float32, eps=LN_EPS)
    if return_intermediates:
        return out, inter
    return out


# --- int8 static-scale mode ---------------------------------------------------


def calibrate_m3ae(packed, patch, num_heads: int, text_ids=None,
                   text_padding_mask=None, goal_patch=None):
    """bf16 forward collecting per-site absolute maxima.

    Sites: img (patch input), per-layer qkv / attn_out / fc / proj — the
    inputs of each int8 matmul.  KEEP IN LOCKSTEP with
    :func:`m3ae_encode_int8`'s layer body (same rule as vit_infer).
    """
    cd = jnp.bfloat16
    amax_img = jnp.max(jnp.abs(patch.astype(jnp.float32)))
    x, pad = _token_stream(packed, patch, text_ids, text_padding_mask, goal_patch, cd)

    def layer(x, L):
        y = _ln(x, L["ln1_s"], L["ln1_b"], cd, eps=LN_EPS)
        a_qkv = jnp.max(jnp.abs(y.astype(jnp.float32)))
        qkv = (y @ L["wqkv"].astype(cd)).astype(jnp.float32) + L["bqkv"]
        a_attn_in = jnp.max(jnp.abs(qkv))  # q/k/v operand scale (int8_attn)
        qkv = qkv.astype(cd)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        a = _attention(q, k, v, num_heads, kv_padding=pad)
        a_out = jnp.max(jnp.abs(a.astype(jnp.float32)))
        x = x + ((a @ L["wout"].astype(cd)).astype(jnp.float32) + L["bout"]).astype(cd)
        y = _ln(x, L["ln2_s"], L["ln2_b"], cd, eps=LN_EPS)
        a_fc = jnp.max(jnp.abs(y.astype(jnp.float32)))
        h = (y @ L["wfc"].astype(cd)).astype(jnp.float32) + L["bfc"]
        h = jax.nn.gelu(h, approximate=True)
        a_proj = jnp.max(jnp.abs(h))
        x = x + ((h.astype(cd) @ L["wproj"].astype(cd)).astype(jnp.float32) + L["bproj"]).astype(cd)
        return x, {"qkv": a_qkv, "attn_in": a_attn_in, "attn_out": a_out,
                   "fc": a_fc, "proj": a_proj}

    _, site_amax = jax.lax.scan(layer, x, packed["layers"])
    return {"img": amax_img, "layers": site_amax}


def quantize_m3ae_packed(packed, amax, margin: float = 1.05) -> dict:
    """bf16 pack + calibration amaxes -> int8 pack (weights per-out-channel)."""
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
    q, ws = _quant_w(packed["img_w"])
    qpack.update(img_w_q=q, img_w_ws=ws, a_img=jnp.asarray(amax["img"], jnp.float32) * margin)
    qpack.pop("img_w")
    return qpack


def m3ae_encode_int8(
    qpacked,
    patch,
    num_heads: int,
    text_ids=None,
    text_padding_mask=None,
    goal_patch=None,
    score_dtype=jnp.float32,
    return_intermediates: bool = False,
    unroll: bool = False,
    fuse_quant: bool = False,
    int8_attn: bool = False,
):
    """int8 forward with static activation scales.

    attention + residual stream stay bf16; LN statistics and matmul epilogues
    fp32.  Output fp32 tokens, same layout as :func:`m3ae_encode`.

    ``fuse_quant=True`` folds the activation quantization into the LN / GELU
    epilogues (explicit int8 tensors between matmuls) — the round-4
    hypothesis recipe, MEASURED SLOWER than the default on the v5e CLIP
    tower A/B (bench_encode_variants fast_int8_sm16[_nofuse]: 3,926 vs
    4,140 fps at b=128): XLA already fuses the LN->quantize chain into the
    int8 dot and schedules the plain body better.  Default False = LN ->
    bf16 -> quantize-in-matmul (:func:`vit_infer._qmatmul`).

    ``int8_attn=True`` runs the two attention matmuls w8a8
    (:func:`vit_infer._attention_int8`) — requires a pack calibrated with
    the ``attn_in`` site (round 4+).
    """
    cd = jnp.bfloat16
    x, pad = _token_stream(packed=qpacked, patch=patch, text_ids=text_ids,
                           text_padding_mask=text_padding_mask,
                           goal_patch=goal_patch, cd=cd, quantized=True)
    L = qpacked["layers"]
    if int8_attn and "a_attn_in" not in L:
        raise ValueError(
            "int8_attn needs the 'attn_in' calibration site — recalibrate "
            "this pack with calibrate_m3ae (round-4+) before quantize_m3ae_packed")

    def qmat(q8, a_scale, wq, ws, bias):
        acc = jnp.matmul(q8, wq, preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (ws * (a_scale / 127.0)) + bias

    def attn(q, k, v, L):
        if int8_attn:
            return _attention_int8(q, k, v, num_heads, L["a_attn_in"],
                                   score_dtype, kv_padding=pad)
        return _attention(q, k, v, num_heads, score_dtype, kv_padding=pad)

    def layer(x, L):
        if not fuse_quant:
            y = _ln(x, L["ln1_s"], L["ln1_b"], cd, eps=LN_EPS)
            qkv = _qmatmul(y, L["a_qkv"], L["wqkv_q"], L["wqkv_ws"], L["bqkv"]).astype(cd)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            a = attn(q, k, v, L)
            x = x + _qmatmul(a, L["a_attn_out"], L["wout_q"], L["wout_ws"], L["bout"]).astype(cd)
            y = _ln(x, L["ln2_s"], L["ln2_b"], cd, eps=LN_EPS)
            h = _qmatmul(y, L["a_fc"], L["wfc_q"], L["wfc_ws"], L["bfc"])
            h = jax.nn.gelu(h, approximate=True).astype(cd)  # fp32 gelu, bf16 out
            x = x + _qmatmul(h, L["a_proj"], L["wproj_q"], L["wproj_ws"], L["bproj"]).astype(cd)
            return x, x
        q8 = _ln_quant(x, L["ln1_s"], L["ln1_b"], L["a_qkv"], eps=LN_EPS)
        qkv = qmat(q8, L["a_qkv"], L["wqkv_q"], L["wqkv_ws"], L["bqkv"]).astype(cd)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        a = attn(q, k, v, L)
        inv = 127.0 / jnp.maximum(L["a_attn_out"], 1e-12)
        a8 = jnp.clip(jnp.round(a.astype(jnp.float32) * inv), -127, 127).astype(jnp.int8)
        x = x + qmat(a8, L["a_attn_out"], L["wout_q"], L["wout_ws"], L["bout"]).astype(cd)
        q8 = _ln_quant(x, L["ln2_s"], L["ln2_b"], L["a_fc"], eps=LN_EPS)
        h = qmat(q8, L["a_fc"], L["wfc_q"], L["wfc_ws"], L["bfc"])
        h = jax.nn.gelu(h, approximate=True)  # fp32 epilogue, quantized in place
        inv = 127.0 / jnp.maximum(L["a_proj"], 1e-12)
        h8 = jnp.clip(jnp.round(h * inv), -127, 127).astype(jnp.int8)
        x = x + qmat(h8, L["a_proj"], L["wproj_q"], L["wproj_ws"], L["bproj"]).astype(cd)
        return x, x

    if unroll:
        inter = []
        for Li in _unstack(L):
            x, _ = layer(x, Li)
            inter.append(x)
        inter = jnp.stack(inter)
    else:
        x, inter = jax.lax.scan(layer, x, L)
    out = _ln(x, qpacked["ln_f_s"], qpacked["ln_f_b"], jnp.float32, eps=LN_EPS)
    if return_intermediates:
        return out, inter
    return out


def build_m3ae_qpack(
    variables,
    depth: int,
    num_heads: int,
    sample_patch,
    text_ids=None,
    text_padding_mask=None,
    goal_patch=None,
    margin: float = 1.05,
    return_amax: bool = False,
):
    """pack -> calibrate (jitted, on real frames) -> quantize, in one call.

    ``sample_patch`` should be a representative pre-patchified batch (the
    trainer uses its first un-augmented batch; the 5% margin covers
    augmentation jitter — same recipe as the reward engine's lazy int8
    calibration in reward/engine.py).
    """
    packed = pack_m3ae_params(variables, depth)
    amax = jax.device_get(jax.jit(calibrate_m3ae, static_argnums=(2,))(
        packed, sample_patch, num_heads, text_ids, text_padding_mask, goal_patch
    ))
    qpack = quantize_m3ae_packed(packed, amax, margin=margin)
    return (qpack, amax) if return_amax else qpack
