"""On-device image augmentation (replaces the reference's augmax dependency).

The reference builds an augmax chain — Resize -> ByteToFloat -> {RandomCrop
0.8x + Resize, ColorJitter(0.4, 0.4, 0.4, 0.5), Rotate} -> Normalize with
Procgen statistics — jitted+vmapped per device and pmap'd over devices
(main_procgen.py:232-294).  This module provides the same ops as pure-JAX
functions composed into one jitted, batch-vmapped program with per-image rng
folding; it runs sharded over the mesh like any other jitted step.

All ops take/return float32 HWC in [0, 1] until the final normalize.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PROCGEN_MEAN = (0.5762, 0.5503, 0.5213)
PROCGEN_STD = (0.3207, 0.3169, 0.3307)


def resize_bilinear(img, h, w):
    return jax.image.resize(img, (h, w, img.shape[-1]), method="bilinear")


def random_crop(img, rng, crop_h: int, crop_w: int):
    """Random crop then resize back to the input size."""
    h, w, _ = img.shape
    ry, rx = jax.random.split(rng)
    y0 = jax.random.randint(ry, (), 0, h - crop_h + 1)
    x0 = jax.random.randint(rx, (), 0, w - crop_w + 1)
    crop = jax.lax.dynamic_slice(img, (y0, x0, 0), (crop_h, crop_w, img.shape[-1]))
    return resize_bilinear(crop, h, w)


def _rgb_to_grayscale(img):
    weights = jnp.array([0.299, 0.587, 0.114], img.dtype)
    return jnp.sum(img * weights, axis=-1, keepdims=True)


def color_jitter(img, rng, brightness=0.4, contrast=0.4, saturation=0.4, hue=0.5):
    """Brightness/contrast/saturation multiplicative jitter + hue rotation."""
    rb, rc, rs, rh = jax.random.split(rng, 4)
    if brightness > 0:
        f = jax.random.uniform(rb, (), minval=max(0.0, 1 - brightness), maxval=1 + brightness)
        img = img * f
    if contrast > 0:
        f = jax.random.uniform(rc, (), minval=max(0.0, 1 - contrast), maxval=1 + contrast)
        mean = jnp.mean(_rgb_to_grayscale(img))
        img = mean + (img - mean) * f
    if saturation > 0:
        f = jax.random.uniform(rs, (), minval=max(0.0, 1 - saturation), maxval=1 + saturation)
        gray = _rgb_to_grayscale(img)
        img = gray + (img - gray) * f
    if hue > 0:
        # hue rotation in YIQ space (differentiable, no per-pixel branching)
        theta = jax.random.uniform(rh, (), minval=-hue, maxval=hue) * jnp.pi
        cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
        to_yiq = jnp.array(
            [[0.299, 0.587, 0.114], [0.596, -0.274, -0.322], [0.211, -0.523, 0.312]], img.dtype
        )
        from_yiq = jnp.linalg.inv(to_yiq)
        rot = jnp.array(
            [[1.0, 0.0, 0.0], [0.0, cos_t, -sin_t], [0.0, sin_t, cos_t]], img.dtype
        )
        img = img @ (from_yiq @ rot @ to_yiq).T
    return jnp.clip(img, 0.0, 1.0)


def random_rotate(img, rng, max_angle_deg: float = 30.0):
    """Rotate by a uniform random angle via inverse bilinear sampling."""
    angle = jax.random.uniform(rng, (), minval=-max_angle_deg, maxval=max_angle_deg)
    theta = angle * jnp.pi / 180.0
    h, w, c = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij")
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    src_y = cos_t * (yy - cy) + sin_t * (xx - cx) + cy
    src_x = -sin_t * (yy - cy) + cos_t * (xx - cx) + cx
    y0 = jnp.floor(src_y).astype(jnp.int32)
    x0 = jnp.floor(src_x).astype(jnp.int32)
    wy = src_y - y0
    wx = src_x - x0

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yi = jnp.clip(yi, 0, h - 1)
        xi = jnp.clip(xi, 0, w - 1)
        return img[yi, xi] * valid[..., None]

    out = (
        gather(y0, x0) * ((1 - wy) * (1 - wx))[..., None]
        + gather(y0, x0 + 1) * ((1 - wy) * wx)[..., None]
        + gather(y0 + 1, x0) * (wy * (1 - wx))[..., None]
        + gather(y0 + 1, x0 + 1) * (wy * wx)[..., None]
    )
    return out


def normalize(img, mean=PROCGEN_MEAN, std=PROCGEN_STD):
    return (img - jnp.asarray(mean, img.dtype)) / jnp.asarray(std, img.dtype)


def make_augment_fn(
    augmentations: str = "random_crop, color_jitter",
    image_size: int = 224,
    source_size: int = 256,
    mean=PROCGEN_MEAN,
    std=PROCGEN_STD,
):
    """Build a jitted batched augment fn: (B, H, W, C) uint8, rng -> float32.

    Augmentation names follow the reference config strings
    (data_procgen.py:38: "random_crop,color_jitter"; rotate optional).
    The random-crop size is 0.8x the *source* image size, mirroring
    main_procgen.py:247-251.
    """
    augs = [a.strip() for a in augmentations.split(",") if a.strip()]
    crop_size = int(source_size * 0.8)

    def single(img, rng):
        img = resize_bilinear(img.astype(jnp.float32), image_size, image_size) / 255.0
        for i, aug in enumerate(augs):
            rng_i = jax.random.fold_in(rng, i)
            if aug == "random_crop":
                # crop in source scale ratio, applied at the resized resolution
                ratio = crop_size / source_size
                ch = cw = int(image_size * ratio)
                img = random_crop(img, rng_i, ch, cw)
            elif aug == "color_jitter":
                img = color_jitter(img, rng_i)
            elif aug == "rotate":
                img = random_rotate(img, rng_i)
            else:
                raise ValueError(f"unknown augmentation {aug!r}")
        return normalize(img, mean, std)

    @jax.jit
    def batch_fn(images, rng):
        rngs = jax.random.split(rng, images.shape[0] + 1)
        out = jax.vmap(single)(images, rngs[:-1])
        return out, rngs[-1]

    return batch_fn


def make_eval_transform(image_size: int = 224, mean=PROCGEN_MEAN, std=PROCGEN_STD):
    """Deterministic eval transform: resize + normalize (main_procgen.py:279-294)."""

    @jax.jit
    def transform(images):
        x = images.astype(jnp.float32)
        if x.ndim == 3:
            x = x[None]
            squeeze = True
        else:
            squeeze = False
        x = jax.image.resize(x, (x.shape[0], image_size, image_size, x.shape[-1]), method="bilinear")
        x = normalize(x / 255.0, mean, std)
        return x[0] if squeeze else x

    return transform


def mixup_cutmix(rng, images, labels, num_classes, mixup_alpha=0.8, cutmix_alpha=1.0, switch_prob=0.5):
    """Batch mixup/cutmix (reference: m3ae/jax_utils.py:139-203).

    images: (B, H, W, C) float; labels: (B,) int -> returns mixed images and
    soft labels (B, num_classes).
    """
    b, h, w, _ = images.shape
    onehot = jax.nn.one_hot(labels, num_classes)
    perm_rng, mix_rng, cut_rng, switch_rng, box_rng = jax.random.split(rng, 5)
    perm = jax.random.permutation(perm_rng, b)
    use_cutmix = jax.random.uniform(switch_rng, ()) < switch_prob

    lam_mix = jax.random.beta(mix_rng, mixup_alpha, mixup_alpha, ())
    lam_cut = jax.random.beta(cut_rng, cutmix_alpha, cutmix_alpha, ())

    # mixup branch
    mixed_up = lam_mix * images + (1 - lam_mix) * images[perm]

    # cutmix branch: paste a random box from the permuted batch
    ratio = jnp.sqrt(1.0 - lam_cut)
    cut_h = (h * ratio).astype(jnp.int32)
    cut_w = (w * ratio).astype(jnp.int32)
    cy = jax.random.randint(box_rng, (), 0, h)
    cx = jax.random.randint(jax.random.fold_in(box_rng, 1), (), 0, w)
    y0 = jnp.clip(cy - cut_h // 2, 0, h)
    y1 = jnp.clip(cy + cut_h // 2, 0, h)
    x0 = jnp.clip(cx - cut_w // 2, 0, w)
    x1 = jnp.clip(cx + cut_w // 2, 0, w)
    yy = jnp.arange(h)[None, :, None, None]
    xx = jnp.arange(w)[None, None, :, None]
    in_box = ((yy >= y0) & (yy < y1) & (xx >= x0) & (xx < x1)).astype(images.dtype)
    cut = images * (1 - in_box) + images[perm] * in_box
    lam_cut_eff = 1.0 - ((y1 - y0) * (x1 - x0)) / (h * w)

    images_out = jnp.where(use_cutmix, cut, mixed_up)
    lam = jnp.where(use_cutmix, lam_cut_eff, lam_mix)
    labels_out = lam * onehot + (1 - lam) * onehot[perm]
    return images_out, labels_out
