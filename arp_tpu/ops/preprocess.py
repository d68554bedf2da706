"""Image preprocessing for CLIP reward labeling: resize + normalize, on device.

The reference pipeline is per-image PIL on the host
(``ToPILImage -> Resize(224, BICUBIC) -> CenterCrop -> ToTensor -> Normalize``,
label_reward.py:90-121) — the throughput bottleneck its GPU never fixes.
Here both steps are batched jittable array ops feeding straight into the CLIP
encoder, with two resize modes:

  * ``fast`` — ``jax.image.resize`` bicubic with anti-aliasing: pure float,
    fully fused by XLA, fastest.
  * ``pil``  — bit-exact re-implementation of Pillow's fixed-point uint8
    bicubic resampling (two separable passes, INT32 accumulation with
    PRECISION_BITS=22, per-pass rounding to uint8).  Produces the *same bytes*
    as the reference preprocessing, so labeled rewards match the reference to
    float-accumulation noise.  Integer gathers/MACs run on the VPU; cost is
    negligible next to the ViT forward.

Coefficient tables are tiny (out_size x ksize), computed on host once per
shape and closed over as constants.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

PRECISION_BITS = 32 - 8 - 2  # Pillow's fixed-point precision for 8bpc


def _bicubic_filter(x: float, a: float = -0.5) -> float:
    x = abs(x)
    if x < 1.0:
        return ((a + 2.0) * x - (a + 3.0)) * x * x + 1
    if x < 2.0:
        return (((x - 5) * x + 8) * x - 4) * a
    return 0.0


@functools.lru_cache(maxsize=64)
def _pil_coeffs(in_size: int, out_size: int):
    """Pillow precompute_coeffs + normalize_coeffs_8bpc (support=2 bicubic)."""
    support_base = 2.0
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = support_base * filterscale
    ksize = int(math.ceil(support)) * 2 + 1

    bounds = np.zeros(out_size, np.int32)
    sizes = np.zeros(out_size, np.int32)
    coeffs = np.zeros((out_size, ksize), np.float64)
    ss = 1.0 / filterscale
    for xx in range(out_size):
        center = (xx + 0.5) * scale
        # Pillow rounds the window edges: (int)(center - support + 0.5)
        xmin = int(center - support + 0.5)
        if xmin < 0:
            xmin = 0
        xmax = int(center + support + 0.5)
        if xmax > in_size:
            xmax = in_size
        n = xmax - xmin
        total = 0.0
        for x in range(n):
            w = _bicubic_filter((x + xmin - center + 0.5) * ss)
            coeffs[xx, x] = w
            total += w
        if total != 0.0:
            coeffs[xx, :n] /= total
        bounds[xx] = xmin
        sizes[xx] = n

    # fixed-point conversion (normalize_coeffs_8bpc)
    kk = np.where(
        coeffs < 0,
        (-0.5 + coeffs * (1 << PRECISION_BITS)).astype(np.int64),
        (0.5 + coeffs * (1 << PRECISION_BITS)).astype(np.int64),
    ).astype(np.int32)
    # gather indices clamped into range (zero coeffs beyond `sizes` make the
    # clamped values irrelevant)
    idx = bounds[:, None] + np.arange(ksize)[None, :]
    idx = np.minimum(idx, in_size - 1).astype(np.int32)
    tap_live = np.arange(ksize)[None, :] < sizes[:, None]
    kk = np.where(tap_live, kk, 0)
    return idx, kk


def _pil_pass(img: jnp.ndarray, idx, kk) -> jnp.ndarray:
    """One separable resample pass along axis 1.

    img: int32 (B, in, ...) -> (B, out, ...); fixed-point MAC + round + clip,
    matching Pillow's ImagingResampleHorizontal_8bpc arithmetic.
    """
    gathered = jnp.take(img, jnp.asarray(idx), axis=1)  # (B, out, ksize, ...)
    kk = jnp.asarray(kk).reshape(1, *kk.shape, *([1] * (img.ndim - 2)))
    acc = jnp.sum(gathered * kk, axis=2)
    half = 1 << (PRECISION_BITS - 1)
    out = (acc + half) >> PRECISION_BITS
    return jnp.clip(out, 0, 255)


def resize_bicubic_pil(images: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bit-exact Pillow uint8 bicubic resize.  images: (B, H, W, C) uint8."""
    _, h, w, _ = images.shape
    x = images.astype(jnp.int32)
    # horizontal pass (resample W)
    idx_w, kk_w = _pil_coeffs(w, out_w)
    x = jnp.swapaxes(x, 1, 2)  # (B, W, H, C)
    x = _pil_pass(x, idx_w, kk_w)  # (B, outW, H, C)
    x = jnp.swapaxes(x, 1, 2)  # (B, H, outW, C)
    # vertical pass (resample H)
    idx_h, kk_h = _pil_coeffs(h, out_h)
    x = _pil_pass(x, idx_h, kk_h)  # (B, outH, outW, C)
    return x.astype(jnp.uint8)


@functools.lru_cache(maxsize=32)
def _pil_matmul_operands(in_size: int, out_size: int, channels: int):
    """Dense resample matrices for the MXU formulation, 8-bit 3-way split.

    The fixed-point coefficients kk (<=23 bits signed) split exactly as

        kk = a * 2^16 + b * 2^8 + c,   a = kk >> 16 (signed, |a| <= 64),
                                       b, c in [0, 255]

    so every operand fits an 8-bit mantissa: against uint8 pixels all
    products (<= 255*255) and <=7-tap partial sums (< 2^19) are EXACT even in
    plain bf16 MXU matmuls with f32 accumulation.  Three full-speed bf16
    matmuls replace one inexact 23-bit pass; the final >>22 recombination
    happens in int32 via staged shifts that never overflow (see _pil_round).

    When ``channels > 1`` the matrix is channel-interleaved so the resample
    runs directly on packed (…, W*C) arrays — no minor-dim-3 layouts anywhere.
    Returns numpy arrays (this fn is lru_cached; device constants must not
    leak across jit traces).
    """
    idx, kk = _pil_coeffs(in_size, out_size)
    M = np.zeros((in_size, out_size), np.int64)
    for o in range(out_size):
        for k in range(idx.shape[1]):
            if kk[o, k] != 0:
                M[idx[o, k], o] += kk[o, k]
    if channels > 1:
        M2 = np.zeros((in_size * channels, out_size * channels), np.int64)
        for c in range(channels):
            M2[c::channels, c::channels] = M
        M = M2
    a = M >> 16  # arithmetic shift: signed high chunk
    b = (M >> 8) & 255
    c = M & 255
    assert (M == a * 65536 + b * 256 + c).all()
    to_bf16 = lambda m: m.astype(np.float32).astype(jnp.bfloat16)
    return to_bf16(a), to_bf16(b), to_bf16(c)


def _pil_round(acc_a: jnp.ndarray, acc_b: jnp.ndarray, acc_c: jnp.ndarray) -> jnp.ndarray:
    """(A*2^16 + B*2^8 + C + 2^21) >> 22 in int32 without overflow.

    C >= 0, so by the floor-division identity the result equals
    ((A << 8) + B + ((C + 2^21) >> 8)) >> 14; every stage stays < 2^31
    (|A| <= 2^17, B <= 2^19, C <= 2^19).
    """
    A = acc_a.astype(jnp.int32)
    B = acc_b.astype(jnp.int32)
    C = acc_c.astype(jnp.int32) + (1 << (PRECISION_BITS - 1))
    out = ((A << 8) + B + (C >> 8)) >> (PRECISION_BITS - 8)
    return jnp.clip(out, 0, 255)


def _pil_pass_matmul(x_int: jnp.ndarray, mats, dn) -> jnp.ndarray:
    """One resample pass: three exact bf16 matmuls + int32 recombination."""
    xb = x_int.astype(jnp.bfloat16)
    accs = [
        jax.lax.dot_general(xb, jnp.asarray(m), dn, preferred_element_type=jnp.float32)
        for m in mats
    ]
    return _pil_round(*accs)


def resize_bicubic_pil_packed(
    x: jnp.ndarray, channels: int, out_h: int, out_w: int
) -> jnp.ndarray:
    """Bit-exact Pillow bicubic resize on channel-packed layout, MXU-native.

    x: (B, H, W*C) holding exact uint8 values (any integer/float dtype).
    Returns (B, out_h, out_w*C) float32 (exact uint8 values).

    Both separable passes are dense banded bf16 matmuls (exact by the 8-bit
    operand split, see :func:`_pil_matmul_operands`) — orders of magnitude
    faster on TPU than the gather-based :func:`resize_bicubic_pil`, which
    suffers from scalar gathers and minor-dim-3 layouts.
    """
    b, h, wc = x.shape
    w = wc // channels
    # horizontal: contract packed W*C axis
    x = _pil_pass_matmul(x, _pil_matmul_operands(w, out_w, channels), (((2,), (0,)), ((), ())))
    # vertical: contract H (axis 1), keep packed minor axis
    x = _pil_pass_matmul(x, _pil_matmul_operands(h, out_h, 1), (((1,), (0,)), ((), ())))
    # dot_general output dims: (batch, out_w*C, out_h) -> transpose minor two
    return jnp.swapaxes(x, 1, 2).astype(jnp.float32)


def clip_preprocess_packed_patches(
    frames_packed: jnp.ndarray,
    channels: int = 3,
    image_size: int = 224,
    patch_size: int = 16,
    mean=(0.48145466, 0.4578275, 0.40821073),
    std=(0.26862954, 0.26130258, 0.27577711),
) -> jnp.ndarray:
    """uint8 packed frames (B, H, W*C) -> normalized ViT patches (B, N, P*P*C).

    The whole pipeline stays in lane-friendly packed layouts: bit-exact PIL
    resize (matmuls), /255 + per-channel normalize (channel pattern tiled
    along the packed axis), then direct reassembly into patch vectors in the
    (p_row, p_col, channel) order expected by the converted conv1 kernel.
    """
    x = frames_packed.astype(jnp.float32)
    if frames_packed.shape[1] != image_size or frames_packed.shape[2] != image_size * channels:
        x = resize_bicubic_pil_packed(x, channels, image_size, image_size)
    mean_packed = jnp.tile(jnp.asarray(mean, jnp.float32), image_size)
    std_packed = jnp.tile(jnp.asarray(std, jnp.float32), image_size)
    x = (x / 255.0 - mean_packed) / std_packed
    b = x.shape[0]
    p = patch_size
    n_side = image_size // p
    # (B, n_h, p_row, n_w, p_col*C) -> (B, n_h, n_w, p_row, p_col*C) -> (B, N, P*P*C)
    x = x.reshape(b, n_side, p, n_side, p * channels)
    x = x.transpose(0, 1, 3, 2, 4)
    return x.reshape(b, n_side * n_side, p * p * channels)


def resize_bicubic_pil_host(
    images: np.ndarray, out_h: int, out_w: int, num_threads: int = 0
) -> np.ndarray:
    """Pillow-bit-exact bicubic resize on the HOST (C++ thread pool).

    Same arithmetic (and the same coefficient tables) as the on-device
    :func:`resize_bicubic_pil`, but runs before the host->device transfer so
    only ``out_h x out_w`` bytes ever cross the link — the win when the
    pipeline is transfer-bound (see docs/BENCHMARKS.md bisect).  Falls back
    to a vectorized numpy implementation when the native library is absent.

    images: (B, H, W, C) uint8 -> (B, out_h, out_w, C) uint8.
    """
    import ctypes

    from ..data.arps import _native_lib

    images = np.ascontiguousarray(images, dtype=np.uint8)
    b, h, w, c = images.shape
    idx_w, kk_w = _pil_coeffs(w, out_w)
    idx_h, kk_h = _pil_coeffs(h, out_h)
    lib = _native_lib()
    if lib is not None:
        out = np.empty((b, out_h, out_w, c), np.uint8)
        if num_threads <= 0:
            num_threads = min(16, os.cpu_count() or 1)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        as_i32 = lambda a: np.ascontiguousarray(a, np.int32)
        idx_w, kk_w, idx_h, kk_h = map(as_i32, (idx_w, kk_w, idx_h, kk_h))
        lib.pil_resize_batch(
            images.ctypes.data_as(u8p), out.ctypes.data_as(u8p), b,
            h, w, c, out_h, out_w,
            idx_w.ctypes.data_as(i32p), kk_w.ctypes.data_as(i32p), idx_w.shape[1],
            idx_h.ctypes.data_as(i32p), kk_h.ctypes.data_as(i32p), idx_h.shape[1],
            num_threads,
        )
        return out
    # numpy fallback: same two fixed-point passes, vectorized
    half = 1 << (PRECISION_BITS - 1)

    def _pass(x, idx, kk):  # x: (B, in, rest) int64 along axis 1
        acc = np.einsum("bokr,ok->bor", x[:, idx], kk.astype(np.int64))
        return np.clip((acc + half) >> PRECISION_BITS, 0, 255)

    x = images.astype(np.int64).reshape(b, h, w * c)
    x = np.swapaxes(x.reshape(b, h, w, c), 1, 2).reshape(b, w, h * c)
    x = _pass(x, idx_w, kk_w)  # (B, outW, H*C)
    x = np.swapaxes(x.reshape(b, out_w, h, c), 1, 2).reshape(b, h, out_w * c)
    x = _pass(x, idx_h, kk_h)  # (B, outH, outW*C)
    return x.reshape(b, out_h, out_w, c).astype(np.uint8)


def resize_bicubic_fast(images: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Float bicubic + antialias resize (XLA-fused).  Returns float32 0..255."""
    x = images.astype(jnp.float32)
    return jax.image.resize(x, (x.shape[0], out_h, out_w, x.shape[3]), method="bicubic", antialias=True)


def center_crop_np(images: np.ndarray, crop_h: int, crop_w: int) -> np.ndarray:
    """Host-side center crop with the same arithmetic as :func:`center_crop`."""
    start_h = int((images.shape[1] - crop_h) / 2)
    start_w = int((images.shape[2] - crop_w) / 2)
    return images[:, start_h : start_h + crop_h, start_w : start_w + crop_w, :]


def center_crop(images: jnp.ndarray, crop_h: int, crop_w: int) -> jnp.ndarray:
    """Center crop (B, H, W, C); same arithmetic as label_reward.py:15-36."""
    h, w = images.shape[1], images.shape[2]
    start_h = int((h - crop_h) / 2)
    start_w = int((w - crop_w) / 2)
    return images[:, start_h : start_h + crop_h, start_w : start_w + crop_w, :]


def clip_preprocess(
    images: jnp.ndarray,
    image_size: int = 224,
    mean=(0.48145466, 0.4578275, 0.40821073),
    std=(0.26862954, 0.26130258, 0.27577711),
    resize_mode: str = "pil",
    crop_half: bool = False,
) -> jnp.ndarray:
    """uint8 (B, H, W, C) frames -> normalized float32 CLIP input.

    ``crop_half`` reproduces the reference's ``use_crop`` option (center-crop
    to half size before resizing, label_reward.py:92-106).
    """
    if crop_half:
        images = center_crop(images, images.shape[1] // 2, images.shape[2] // 2)
    if resize_mode == "pil":
        if images.shape[1:3] != (image_size, image_size):
            images = resize_bicubic_pil(images, image_size, image_size)
        x = images.astype(jnp.float32)
    elif resize_mode == "fast":
        if images.shape[1:3] != (image_size, image_size):
            x = resize_bicubic_fast(images, image_size, image_size)
        else:
            x = images.astype(jnp.float32)
    else:
        raise ValueError(resize_mode)
    x = x / 255.0
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x - mean) / std
