"""Resize parity: the 'pil' mode must be bit-exact vs actual Pillow."""

import numpy as np
import pytest
from PIL import Image

from arp_tpu.ops.preprocess import (
    center_crop,
    clip_preprocess,
    resize_bicubic_fast,
    resize_bicubic_pil,
)


@pytest.mark.parametrize("in_size,out_size", [(256, 224), (64, 224), (512, 224), (100, 50)])
def test_pil_exact_resize(in_size, out_size):
    rng = np.random.default_rng(in_size)
    imgs = rng.integers(0, 256, size=(3, in_size, in_size, 3), dtype=np.uint8)
    got = np.asarray(resize_bicubic_pil(imgs, out_size, out_size))
    for i in range(imgs.shape[0]):
        expected = np.asarray(
            Image.fromarray(imgs[i]).resize((out_size, out_size), Image.BICUBIC)
        )
        np.testing.assert_array_equal(got[i], expected)


def test_fast_resize_close_to_pil():
    rng = np.random.default_rng(7)
    imgs = rng.integers(0, 256, size=(2, 256, 256, 3), dtype=np.uint8)
    fast = np.asarray(resize_bicubic_fast(imgs, 224, 224))
    pil = np.asarray(resize_bicubic_pil(imgs, 224, 224)).astype(np.float32)
    # float path: mean error ~0.37 LSB but a heavy tail is inherent to the
    # mode (measured p99.9 ~= 10.8, max ~= 29.8 — PIL's edge handling).
    # Bound shape, not just the mean: a mean-only bound would miss a single
    # corrupt edge row/column (avg err ~85) entirely.
    err = np.abs(fast - pil)
    assert err.mean() < 1.0
    assert err.mean(axis=(0, 2, 3)).max() < 5.0  # no corrupt row
    assert err.mean(axis=(0, 1, 3)).max() < 5.0  # no corrupt column
    assert err.max() < 64.0


def test_center_crop_matches_reference_arithmetic():
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, size=(2, 256, 256, 3), dtype=np.uint8)
    got = np.asarray(center_crop(imgs, 128, 128))
    start = int((256 - 128) / 2)
    np.testing.assert_array_equal(got, imgs[:, start : start + 128, start : start + 128, :])
    # odd height-difference: we pin the FLOOR arithmetic of the reference's
    # own numpy helper (label_reward.py:15-36).  NOTE the reference's
    # use_crop torchvision chain (CenterCrop) rounds half-to-even instead —
    # the two reference paths agree for every production size (procgen
    # frames are 64/256; diffs always even) but diverge for odd diffs;
    # this test documents which semantics we implement.
    odd = rng.integers(0, 256, size=(1, 135, 135, 3), dtype=np.uint8)
    got_odd = np.asarray(center_crop(odd, 128, 128))
    np.testing.assert_array_equal(got_odd, odd[:, 3:131, 3:131, :])


def test_clip_preprocess_matches_reference_pipeline():
    """Full pipeline vs the reference's torchvision chain, replicated with
    PIL+numpy (ToPILImage -> Resize(224, BICUBIC) -> CenterCrop(224) ->
    ToTensor -> Normalize; label_reward.py:109-121).  For square inputs the
    CenterCrop is a no-op after the square resize."""
    mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 256, size=(2, 256, 256, 3), dtype=np.uint8)
    expected = []
    for img in imgs:
        r = np.asarray(Image.fromarray(img).resize((224, 224), Image.BICUBIC), np.float32)
        expected.append((r / 255.0 - mean) / std)
    expected = np.stack(expected)
    got = np.asarray(clip_preprocess(imgs, resize_mode="pil"))
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_clip_preprocess_crop_half():
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, size=(2, 256, 256, 3), dtype=np.uint8)
    got = np.asarray(clip_preprocess(imgs, resize_mode="pil", crop_half=True))
    mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
    cropped = imgs[:, 64:192, 64:192, :]
    expected = []
    for img in cropped:
        r = np.asarray(Image.fromarray(img).resize((224, 224), Image.BICUBIC), np.float32)
        expected.append((r / 255.0 - mean) / std)
    np.testing.assert_allclose(got, np.stack(expected), atol=1e-6)


def test_packed_resize_bit_exact():
    from arp_tpu.ops.preprocess import resize_bicubic_pil_packed
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    imgs = rng.integers(0, 256, size=(3, 256, 256, 3), dtype=np.uint8)
    packed = jnp.asarray(imgs.reshape(3, 256, -1).astype(np.float32))
    got = np.asarray(resize_bicubic_pil_packed(packed, 3, 224, 224)).reshape(3, 224, 224, 3)
    for i in range(3):
        expected = np.asarray(Image.fromarray(imgs[i]).resize((224, 224), Image.BICUBIC))
        # compare the FLOAT output against the uint8 oracle: an astype
        # truncation here would mask fractional drift up to ~1 LSB
        np.testing.assert_array_equal(got[i], expected.astype(got.dtype))


def test_packed_patches_match_standard_pipeline():
    from arp_tpu.ops.preprocess import clip_preprocess_packed_patches
    import jax.numpy as jnp

    rng = np.random.default_rng(12)
    imgs = rng.integers(0, 256, size=(2, 256, 256, 3), dtype=np.uint8)
    std_out = np.asarray(clip_preprocess(imgs, resize_mode="pil"))  # (B,224,224,3)
    # manual patchify in (p_row, p_col, channel) order
    p = 16
    b = 2
    ref = std_out.reshape(b, 14, p, 14, p, 3).transpose(0, 1, 3, 2, 4, 5).reshape(b, 196, p * p * 3)
    packed = jnp.asarray(imgs.reshape(b, 256, -1))
    got = np.asarray(clip_preprocess_packed_patches(packed, 3, 224, p))
    np.testing.assert_allclose(got, ref, atol=1e-6)
