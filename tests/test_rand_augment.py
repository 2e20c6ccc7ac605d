"""RandAugment op-by-op parity against PIL (the library timm delegates
to; reference recipe rand-m9-mstd0.5-inc1 at datasets/imagenet.py:64-76).

Pixel ops must match PIL ImageOps/ImageEnhance bit-for-bit (or to 1 LSB
where float rounding differs); geometric warps are checked structurally
(cv2 vs PIL resampling differs sub-pixel at edges).
"""

import random

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image, ImageEnhance, ImageOps

from dat_segmentation_tpu.data.imagenet import (
    RAND_AUGMENT_OPS,
    _blend,
    _gray_l,
    _op_autocontrast,
    _op_brightness,
    _op_color,
    _op_contrast,
    _op_equalize,
    _op_invert,
    _op_posterize_inc,
    _op_rotate,
    _op_sharpness,
    _op_shear_x,
    _op_solarize_add,
    _op_solarize_inc,
    _op_translate_x_rel,
    _op_translate_y_rel,
    rand_augment,
)


def _img(seed=0, h=32, w=40):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3), np.uint8)


class _FixedRng:
    """rng whose random() forces a deterministic sign choice."""

    def __init__(self, val=0.0):
        self.val = val

    def random(self):
        return self.val

    def gauss(self, mu, sigma):
        return mu


def test_policy_covers_timm_rand_transforms():
    """The op set is exactly timm's 15-op _RAND_TRANSFORMS."""
    expected = {
        "AutoContrast", "Equalize", "Invert", "Rotate", "Posterize",
        "Solarize", "SolarizeAdd", "Color", "Contrast", "Brightness",
        "Sharpness", "ShearX", "ShearY", "TranslateXRel", "TranslateYRel",
    }
    assert set(RAND_AUGMENT_OPS) == expected


def test_invert_matches_pil():
    img = _img(1)
    got = _op_invert(img, 9.0, _FixedRng())
    want = np.asarray(ImageOps.invert(Image.fromarray(img)))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("level", [0.0, 4.0, 9.0, 10.0])
def test_solarize_matches_pil(level):
    img = _img(2)
    thresh = 256 - int(level / 10.0 * 256)
    got = _op_solarize_inc(img, level, _FixedRng())
    want = np.asarray(
        ImageOps.solarize(Image.fromarray(img), min(thresh, 255))
        if thresh <= 255
        else Image.fromarray(img)
    )
    if thresh > 255:
        np.testing.assert_array_equal(got, img)
    else:
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("level", [0.0, 5.0, 9.0])
def test_posterize_matches_pil(level):
    img = _img(3)
    bits = 4 - int(level / 10.0 * 4)
    got = _op_posterize_inc(img, level, _FixedRng())
    if bits >= 8:
        np.testing.assert_array_equal(got, img)
    else:
        want = np.asarray(
            ImageOps.posterize(Image.fromarray(img), max(bits, 0))
        )
        np.testing.assert_array_equal(got, want)


def test_solarize_add_semantics():
    img = _img(4)
    got = _op_solarize_add(img, 9.0, _FixedRng())
    add = int(9.0 / 10.0 * 110)
    below = img < 128
    np.testing.assert_array_equal(
        got[below], np.minimum(img[below].astype(np.int32) + add, 255)
    )
    np.testing.assert_array_equal(got[~below], img[~below])


def test_equalize_matches_pil():
    img = _img(5)
    got = _op_equalize(img, 9.0, _FixedRng())
    want = np.asarray(ImageOps.equalize(Image.fromarray(img)))
    np.testing.assert_array_equal(got, want)


def test_autocontrast_matches_pil():
    img = _img(6)
    got = _op_autocontrast(img, 9.0, _FixedRng())
    want = np.asarray(ImageOps.autocontrast(Image.fromarray(img)))
    # PIL uses a LUT built from int arithmetic; allow 1 LSB
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


@pytest.mark.parametrize(
    "opfn,enhancer",
    [
        (_op_color, ImageEnhance.Color),
        (_op_contrast, ImageEnhance.Contrast),
        (_op_brightness, ImageEnhance.Brightness),
        (_op_sharpness, ImageEnhance.Sharpness),
    ],
)
@pytest.mark.parametrize("sign", [0.9, 0.1])  # >0.5 keeps, <=0.5 negates... rng.random()>0.5 negates
def test_enhance_ops_match_pil(opfn, enhancer, sign):
    img = _img(7)
    level = 9.0
    rng = _FixedRng(sign)
    got = opfn(img, level, rng)
    v = level / 10.0 * 0.9
    factor = max(0.1, 1.0 + (-v if sign > 0.5 else v))
    want = np.asarray(enhancer(Image.fromarray(img)).enhance(factor))
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_translate_shifts_pixels():
    img = _img(8, h=20, w=20)
    rng = _FixedRng(0.0)  # positive sign
    got = _op_translate_x_rel(img, 10.0, rng)
    # PIL AFFINE (1,0,p): output(x) = input(x + p); p = 0.45 * 20 = 9
    np.testing.assert_array_equal(got[:, :11], img[:, 9:])
    assert (got[:, 11:] == 128).all()  # grey fill
    got_y = _op_translate_y_rel(img, 10.0, rng)
    np.testing.assert_array_equal(got_y[:11, :], img[9:, :])


def test_shear_and_rotate_structural():
    img = _img(9, h=24, w=24)
    rng = _FixedRng(0.0)
    sheared = _op_shear_x(img, 9.0, rng)
    rotated = _op_rotate(img, 9.0, rng)
    assert sheared.shape == img.shape and rotated.shape == img.shape
    # row 0 of a shear-x keeps its leading pixels (in_x = x + s*0)
    np.testing.assert_array_equal(sheared[0, :10], img[0, :10])
    assert not np.array_equal(rotated, img)


def test_rand_augment_applies_and_is_deterministic():
    img = _img(10)
    out1 = rand_augment(img.copy(), random.Random(123))
    out2 = rand_augment(img.copy(), random.Random(123))
    np.testing.assert_array_equal(out1, out2)
    assert out1.dtype == np.uint8 and out1.shape == img.shape


def test_rand_augment_prob_zero_is_identity():
    img = _img(11)
    out = rand_augment(img.copy(), random.Random(0), prob=0.0)
    np.testing.assert_array_equal(out, img)


def test_magnitude_gaussian_clipped():
    """mstd noise: level stays in [0, 10] (timm clips)."""
    img = _img(12)
    # magnitude 10 + noise can exceed 10 -> must not crash posterize etc.
    for seed in range(5):
        rand_augment(img.copy(), random.Random(seed), magnitude=10, mstd=2.0)
