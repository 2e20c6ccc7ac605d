"""ImageNet folder dataset + training augmentations (host side).

Reference: datasets/imagenet.py — folder dataset (:39-61), timm
``create_transform`` train augs (RandAugment rand-m9-mstd0.5-inc1,
color-jitter 0.4, random-erasing p=0.25, bicubic; :64-76) and val
resize(256, bicubic) + center-crop(224) + normalize.

timm is not a dependency here; the augmentations are implemented directly
(cv2/numpy): RandomResizedCrop, hflip, a RandAugment subset (the 9-magnitude
policy's geometric + color ops), color jitter, normalize, random erasing.
"""

from __future__ import annotations

import random
from pathlib import Path

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

IN_MEAN = np.array([0.485, 0.456, 0.406], np.float32) * 255.0
IN_STD = np.array([0.229, 0.224, 0.225], np.float32) * 255.0


def random_resized_crop(img, rng: random.Random, size=224,
                        scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)):
    h, w = img.shape[:2]
    area = h * w
    for _ in range(10):
        target = rng.uniform(*scale) * area
        ar = np.exp(rng.uniform(np.log(ratio[0]), np.log(ratio[1])))
        cw = int(round(np.sqrt(target * ar)))
        ch = int(round(np.sqrt(target / ar)))
        if 0 < cw <= w and 0 < ch <= h:
            top = rng.randint(0, h - ch)
            left = rng.randint(0, w - cw)
            crop = img[top : top + ch, left : left + cw]
            return cv2.resize(crop, (size, size), interpolation=cv2.INTER_CUBIC)
    # center-crop fallback
    s = min(h, w)
    top, left = (h - s) // 2, (w - s) // 2
    return cv2.resize(
        img[top : top + s, left : left + s], (size, size),
        interpolation=cv2.INTER_CUBIC,
    )


# -- RandAugment: the full timm rand-m9-mstd0.5-inc1 policy ----------------
#
# Reference recipe: datasets/imagenet.py:64-76 builds timm
# ``create_transform(auto_augment='rand-m9-mstd0.5-inc1')``. That policy is
# re-implemented here in full: the 15-op _RAND_TRANSFORMS set, per-op apply
# probability 0.5, per-application magnitude ~ N(9, 0.5) clipped to [0, 10],
# 'increasing'-severity argument mappings, random sign on signed ops, and
# grey (128) fill for geometric warps. Pixel ops follow PIL semantics
# (ImageOps/ImageEnhance), which timm delegates to.

_MAX_LEVEL = 10.0
_FILL = (128, 128, 128)


def _randomly_negate(v, rng):
    return -v if rng.random() > 0.5 else v


def _blend(degenerate, img, factor):
    """PIL Image.blend with extrapolation (ImageEnhance semantics)."""
    out = degenerate.astype(np.float32) + factor * (
        img.astype(np.float32) - degenerate.astype(np.float32)
    )
    return np.clip(out, 0, 255).astype(np.uint8)


def _gray_l(img):
    """PIL convert('L'): ITU-R 601-2 luma, truncated to int."""
    f = img.astype(np.float32)
    return (
        (f[..., 0] * 299 + f[..., 1] * 587 + f[..., 2] * 114) / 1000
    ).astype(np.uint8)


def _warp(img, mtx):
    """PIL Image.transform(AFFINE) equivalence: the matrix is the
    output->input (inverse) map, border filled grey."""
    return cv2.warpAffine(
        img,
        np.asarray(mtx, np.float32),
        (img.shape[1], img.shape[0]),
        flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
        borderMode=cv2.BORDER_CONSTANT,
        borderValue=_FILL,
    )


def _op_autocontrast(img, level, rng):
    out = np.empty_like(img)
    for c in range(3):
        ch = img[..., c]
        lo, hi = int(ch.min()), int(ch.max())
        if hi <= lo:
            out[..., c] = ch
        else:
            scale = 255.0 / (hi - lo)
            out[..., c] = np.clip(
                (ch.astype(np.float32) - lo) * scale + 0.5, 0, 255
            ).astype(np.uint8)
    return out


def _op_equalize(img, level, rng):
    """PIL ImageOps.equalize LUT construction, per channel."""
    out = np.empty_like(img)
    for c in range(3):
        ch = img[..., c]
        h = np.bincount(ch.ravel(), minlength=256)
        nonzero = h[h != 0]
        if len(nonzero) <= 1:
            out[..., c] = ch
            continue
        step = (int(h.sum()) - int(nonzero[-1])) // 255
        if step == 0:
            out[..., c] = ch
            continue
        n = step // 2
        lut = np.empty(256, np.int64)
        for i in range(256):
            lut[i] = n // step
            n += int(h[i])
        out[..., c] = np.clip(lut, 0, 255).astype(np.uint8)[ch]
    return out


def _op_invert(img, level, rng):
    return (255 - img).astype(np.uint8)


def _op_rotate(img, level, rng):
    deg = _randomly_negate(level / _MAX_LEVEL * 30.0, rng)
    # PIL rotates counterclockwise for positive angles; so does cv2.
    mtx = cv2.getRotationMatrix2D(
        ((img.shape[1] - 1) / 2, (img.shape[0] - 1) / 2), deg, 1.0
    )
    return cv2.warpAffine(
        img, mtx, (img.shape[1], img.shape[0]),
        flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=_FILL,
    )


def _op_posterize_inc(img, level, rng):
    bits = 4 - int(level / _MAX_LEVEL * 4)
    if bits >= 8:
        return img
    mask = np.uint8(255 & ~((1 << (8 - bits)) - 1)) if bits > 0 else np.uint8(0)
    return (img & mask).astype(np.uint8)


def _op_solarize_inc(img, level, rng):
    thresh = 256 - int(level / _MAX_LEVEL * 256)
    return np.where(img >= thresh, 255 - img, img).astype(np.uint8)


def _op_solarize_add(img, level, rng):
    add = int(level / _MAX_LEVEL * 110)
    bumped = np.clip(img.astype(np.int32) + add, 0, 255).astype(np.uint8)
    return np.where(img < 128, bumped, img)


def _enhance_factor(level, rng):
    # timm _enhance_increasing_level_to_arg
    v = level / _MAX_LEVEL * 0.9
    return max(0.1, 1.0 + _randomly_negate(v, rng))


def _op_color(img, level, rng):
    degenerate = np.repeat(_gray_l(img)[..., None], 3, axis=-1)
    return _blend(degenerate, img, _enhance_factor(level, rng))


def _op_contrast(img, level, rng):
    mean = int(float(_gray_l(img).mean()) + 0.5)
    return _blend(np.full_like(img, mean), img, _enhance_factor(level, rng))


def _op_brightness(img, level, rng):
    return _blend(np.zeros_like(img), img, _enhance_factor(level, rng))


def _op_sharpness(img, level, rng):
    # PIL ImageFilter.SMOOTH kernel; PIL keeps the 1px border unfiltered
    kernel = np.array(
        [[1, 1, 1], [1, 5, 1], [1, 1, 1]], np.float32
    ) / 13.0
    smooth = cv2.filter2D(img, -1, kernel, borderType=cv2.BORDER_REPLICATE)
    smooth[0, :] = img[0, :]
    smooth[-1, :] = img[-1, :]
    smooth[:, 0] = img[:, 0]
    smooth[:, -1] = img[:, -1]
    return _blend(smooth, img, _enhance_factor(level, rng))


def _op_shear_x(img, level, rng):
    s = _randomly_negate(level / _MAX_LEVEL * 0.3, rng)
    return _warp(img, [[1, s, 0], [0, 1, 0]])


def _op_shear_y(img, level, rng):
    s = _randomly_negate(level / _MAX_LEVEL * 0.3, rng)
    return _warp(img, [[1, 0, 0], [s, 1, 0]])


def _op_translate_x_rel(img, level, rng):
    p = _randomly_negate(level / _MAX_LEVEL * 0.45, rng) * img.shape[1]
    return _warp(img, [[1, 0, p], [0, 1, 0]])


def _op_translate_y_rel(img, level, rng):
    p = _randomly_negate(level / _MAX_LEVEL * 0.45, rng) * img.shape[0]
    return _warp(img, [[1, 0, 0], [0, 1, p]])


# timm _RAND_TRANSFORMS order (rand_augment_ops with increasing=True)
RAND_AUGMENT_OPS = {
    "AutoContrast": _op_autocontrast,
    "Equalize": _op_equalize,
    "Invert": _op_invert,
    "Rotate": _op_rotate,
    "Posterize": _op_posterize_inc,
    "Solarize": _op_solarize_inc,
    "SolarizeAdd": _op_solarize_add,
    "Color": _op_color,
    "Contrast": _op_contrast,
    "Brightness": _op_brightness,
    "Sharpness": _op_sharpness,
    "ShearX": _op_shear_x,
    "ShearY": _op_shear_y,
    "TranslateXRel": _op_translate_x_rel,
    "TranslateYRel": _op_translate_y_rel,
}


def rand_augment(
    img,
    rng: random.Random,
    *,
    n=2,
    magnitude=9,
    mstd=0.5,
    prob=0.5,
):
    """Apply ``n`` randomly chosen ops, each with probability ``prob`` and
    magnitude ~ N(magnitude, mstd) clipped to [0, 10] (timm AugmentOp)."""
    ops = list(RAND_AUGMENT_OPS.values())
    for _ in range(n):
        op = ops[rng.randint(0, len(ops) - 1)]
        if prob < 1.0 and rng.random() > prob:
            continue
        level = magnitude
        if mstd > 0:
            level = rng.gauss(magnitude, mstd)
        level = max(0.0, min(_MAX_LEVEL, level))
        img = op(img, level, rng)
    return img


def random_erasing(img, rng: random.Random, *, p=0.25, scale=(0.02, 1 / 3)):
    if rng.random() >= p:
        return img
    h, w = img.shape[:2]
    area = rng.uniform(*scale) * h * w
    ar = np.exp(rng.uniform(np.log(0.3), np.log(1 / 0.3)))
    eh = int(round(np.sqrt(area / ar)))
    ew = int(round(np.sqrt(area * ar)))
    if eh < h and ew < w:
        top = rng.randint(0, h - eh)
        left = rng.randint(0, w - ew)
        noise = np.random.RandomState(rng.randint(0, 2**31 - 1)).randn(
            eh, ew, 3
        )
        img[top : top + eh, left : left + ew] = noise
    return img


def train_transform_cls(img, rng: random.Random, *, size=224,
                        color_jitter=0.4):
    img = random_resized_crop(img, rng, size)
    if rng.random() < 0.5:
        img = np.ascontiguousarray(img[:, ::-1])
    img = rand_augment(img, rng)
    if color_jitter and rng.random() < 0.8:
        # brightness/contrast/saturation jitter +-cj
        f = 1.0 + rng.uniform(-color_jitter, color_jitter)
        img = np.clip(img.astype(np.float32) * f, 0, 255).astype(np.uint8)
    out = (img.astype(np.float32) - IN_MEAN) / IN_STD
    out = random_erasing(out, rng)
    return out.astype(np.float32)


def val_transform_cls(img, *, size=224, crop_pct=0.875):
    h, w = img.shape[:2]
    scale_size = int(size / crop_pct)
    f = scale_size / min(h, w)
    img = cv2.resize(
        img, (int(w * f + 0.5), int(h * f + 0.5)),
        interpolation=cv2.INTER_CUBIC,
    )
    h, w = img.shape[:2]
    top, left = (h - size) // 2, (w - size) // 2
    img = img[top : top + size, left : left + size]
    return ((img.astype(np.float32) - IN_MEAN) / IN_STD).astype(np.float32)


class ImageNetDataset:
    """<root>/<split>/<class_dir>/*.JPEG folder layout
    (reference datasets/imagenet.py:39-61)."""

    def __init__(self, root: str, split: str = "train", *, size: int = 224,
                 seed: int = 0):
        self.root = Path(root) / split
        if not self.root.exists():
            raise FileNotFoundError(self.root)
        classes = sorted(d.name for d in self.root.iterdir() if d.is_dir())
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples = []
        for c in classes:
            for p in sorted((self.root / c).iterdir()):
                if p.suffix.lower() in (".jpeg", ".jpg", ".png"):
                    self.samples.append((p, self.class_to_idx[c]))
        self.is_train = split == "train"
        self.size = size
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Advance the aug RNG stream (called by DataLoader per epoch);
        per-item RNG is keyed purely by (seed, epoch, idx) so runs are
        reproducible (reference analog: global seeding,
        tools/train.py:190-198)."""
        self.epoch = int(epoch)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx):
        path, label = self.samples[idx]
        img = cv2.imread(str(path), cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if self.is_train:
            rng = random.Random(f"{self.seed}:{self.epoch}:{idx}")
            img = train_transform_cls(img, rng, size=self.size)
        else:
            img = val_transform_cls(img, size=self.size)
        return {"image": img, "label": np.int32(label)}
