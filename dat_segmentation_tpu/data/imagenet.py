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


# -- a RandAugment(m=9, mstd=0.5, inc) subset ------------------------------


def _blend(a, b, t):
    return np.clip(a.astype(np.float32) * (1 - t) + b.astype(np.float32) * t,
                   0, 255).astype(np.uint8)


def _aug_ops():
    def autocontrast(img, _):
        lo, hi = img.min(), img.max()
        if hi <= lo:
            return img
        return ((img.astype(np.float32) - lo) * (255.0 / (hi - lo))).astype(
            np.uint8
        )

    def equalize(img, _):
        out = img.copy()
        for c in range(3):
            out[..., c] = cv2.equalizeHist(img[..., c])
        return out

    def rotate(img, m):
        ang = 30.0 * m
        mtx = cv2.getRotationMatrix2D(
            (img.shape[1] / 2, img.shape[0] / 2), ang, 1.0
        )
        return cv2.warpAffine(img, mtx, (img.shape[1], img.shape[0]))

    def color(img, m):
        gray = cv2.cvtColor(cv2.cvtColor(img, cv2.COLOR_RGB2GRAY),
                            cv2.COLOR_GRAY2RGB)
        return _blend(gray, img, 1.0 + m)

    def contrast(img, m):
        mean = np.full_like(img, int(img.mean()))
        return _blend(mean, img, 1.0 + m)

    def brightness(img, m):
        return _blend(np.zeros_like(img), img, 1.0 + m)

    def sharpness(img, m):
        blur = cv2.GaussianBlur(img, (3, 3), 0)
        return _blend(blur, img, 1.0 + m)

    def shear_x(img, m):
        mtx = np.float32([[1, 0.3 * m, 0], [0, 1, 0]])
        return cv2.warpAffine(img, mtx, (img.shape[1], img.shape[0]))

    def translate_x(img, m):
        mtx = np.float32([[1, 0, 0.45 * m * img.shape[1]], [0, 1, 0]])
        return cv2.warpAffine(img, mtx, (img.shape[1], img.shape[0]))

    def posterize(img, m):
        bits = max(1, int(8 - 4 * abs(m)))
        shift = 8 - bits
        return ((img >> shift) << shift).astype(np.uint8)

    return [autocontrast, equalize, rotate, color, contrast, brightness,
            sharpness, shear_x, translate_x, posterize]


_OPS = None


def rand_augment(img, rng: random.Random, *, n=2, magnitude=9, mstd=0.5):
    global _OPS
    if _OPS is None:
        _OPS = _aug_ops()
    for _ in range(n):
        op = _OPS[rng.randint(0, len(_OPS) - 1)]
        m = rng.gauss(magnitude, mstd)
        m = max(0.0, min(10.0, m)) / 10.0
        if rng.random() < 0.5:
            m = -m
        img = op(img, m)
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

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx):
        path, label = self.samples[idx]
        img = cv2.imread(str(path), cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if self.is_train:
            rng = random.Random(f"{self.seed}:{idx}:{random.random()}")
            img = train_transform_cls(img, rng, size=self.size)
        else:
            img = val_transform_cls(img, size=self.size)
        return {"image": img, "label": np.int32(label)}
