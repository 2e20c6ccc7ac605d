"""Native (C++) data-path ops vs the cv2/numpy reference implementations."""

import numpy as np
import pytest

from dat_segmentation_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libimageops.so not built"
)

cv2 = pytest.importorskip("cv2")


def test_resize_bilinear_close_to_cv2():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (37, 53, 3), np.uint8)
    got = native.resize_bilinear_u8(img, 96, 128)
    ref = cv2.resize(img, (128, 96), interpolation=cv2.INTER_LINEAR)
    # cv2 uses 11-bit fixed point; allow +-2 LSB
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 2


def test_resize_nearest_matches_cv2():
    rng = np.random.RandomState(1)
    mask = rng.randint(0, 150, (37, 53)).astype(np.int32)
    got = native.resize_nearest_i32(mask, 96, 128)
    ref = cv2.resize(mask, (128, 96), interpolation=cv2.INTER_NEAREST)
    assert (got == ref).all()


def test_normalize_pad_matches_numpy():
    from dat_segmentation_tpu.data.ade20k import IMG_NORM_MEAN, IMG_NORM_STD

    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (40, 60, 3), np.uint8)
    got = native.normalize_pad_f32(img, IMG_NORM_MEAN, IMG_NORM_STD, 64, 64)
    ref = np.zeros((64, 64, 3), np.float32)
    ref[:40, :60] = (img.astype(np.float32) - IMG_NORM_MEAN) / IMG_NORM_STD
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_crop_cat_ok_matches_numpy():
    rng = np.random.RandomState(3)
    mask = rng.randint(0, 5, (100, 100)).astype(np.int32)
    mask[:50] = 255
    for top, left in [(0, 0), (40, 40), (60, 10)]:
        crop = mask[top : top + 32, left : left + 32]
        valid = crop != 255
        if valid.any():
            _, counts = np.unique(crop[valid], return_counts=True)
            expect = counts.max() / counts.sum() < 0.75
        else:
            expect = True
        got = native.crop_cat_ok(mask, top, left, 32, 32, num_classes=5)
        assert got == expect


def test_photometric_identity_when_disabled():
    rng = np.random.RandomState(4)
    img = rng.randint(0, 255, (16, 16, 3), np.uint8)
    out = native.photometric_distortion_u8(img)
    # pure RGB->HSV->RGB roundtrip quantization: within 3 LSB of identity
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_photometric_brightness_contrast():
    img = np.full((8, 8, 3), 100, np.uint8)
    out = native.photometric_distortion_u8(img, brightness=20.0)
    assert np.abs(out.astype(int) - 120).max() <= 3
    out = native.photometric_distortion_u8(img, contrast=1.5, contrast_first=True)
    assert np.abs(out.astype(int) - 150).max() <= 3


def test_intersect_union_matches_jax_impl():
    from dat_segmentation_tpu.train.metrics import intersect_and_union
    import jax.numpy as jnp

    rng = np.random.RandomState(5)
    pred = rng.randint(0, 7, (64, 64))
    label = rng.randint(0, 7, (64, 64))
    label[:5] = 255
    gi, gu, ga = native.intersect_union(pred, label, 7)
    ri, ru, _, ra = intersect_and_union(jnp.asarray(pred), jnp.asarray(label), 7)
    np.testing.assert_array_equal(gi, np.asarray(ri))
    np.testing.assert_array_equal(gu, np.asarray(ru))
    np.testing.assert_array_equal(ga, np.asarray(ra))


def test_native_pipeline_integration(tmp_path, monkeypatch):
    """DAT_TPU_NATIVE=1 routes train_transform through the C++ ops."""
    import random

    monkeypatch.setenv("DAT_TPU_NATIVE", "1")
    from dat_segmentation_tpu.data.ade20k import train_transform

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (260, 340, 3), np.uint8)
    mask = rng.randint(0, 150, (260, 340)).astype(np.int32)
    out_img, out_mask = train_transform(img, mask, random.Random(0),
                                        crop_size=(128, 128))
    assert out_img.shape == (128, 128, 3)
    assert out_img.dtype == np.float32
    assert out_mask.shape == (128, 128)
    assert np.abs(out_img).max() < 5.0
