"""ADE20K dataset + augmentation pipeline (host side, cv2/numpy).

Numerics mirror the reference pipeline exactly (reference:
datasets/ade20k.py):
* reduce_zero_label: 0 -> ignore(255), k -> k-1 (:103-106);
* train (:264-314): random scale ratio in [0.5, 2.0] of base (2048, 512)
  -> pad-to-crop -> random 512^2 crop with cat_max_ratio 0.75 / 10
  attempts -> hflip p=0.5 -> photometric distortion (brightness +-32,
  contrast 0.5-1.5, saturation 0.5-1.5, hue +-18 in HSV, random op order)
  -> normalize -> pad (img 0, mask 255);
* val (:317-331): resize to exactly (2048, 512) (keep_ratio=False, the
  standalone default) or keep-ratio fit (the mmseg val mode,
  configs/_base_/datasets/ade20k.py:28) -> normalize -> pad.

Outputs are NHWC float32 images and int32 masks. The optional C++ fast
path (native/imageops) accelerates resize/normalize when built; numpy/cv2
is the always-available fallback.
"""

from __future__ import annotations

import random
from pathlib import Path
from typing import Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

IMG_NORM_MEAN = np.array([123.675, 116.28, 103.53], dtype=np.float32)
IMG_NORM_STD = np.array([58.395, 57.12, 57.375], dtype=np.float32)

CROP_SIZE = (512, 512)  # (W, H)
IMG_SCALE = (2048, 512)  # (W, H)

ADE20K_NUM_CLASSES = 150

# Canonical 150-class names + color palette (the mmseg ADE20KDataset
# CLASSES/PALETTE the reference ships inside checkpoint meta,
# tools/train.py:222-233, and paints --show-dir with, tools/test.py:229-233).
ADE20K_CLASSES = (
    "wall", "building", "sky", "floor", "tree", "ceiling", "road", "bed ",
    "windowpane", "grass", "cabinet", "sidewalk", "person", "earth", "door",
    "table", "mountain", "plant", "curtain", "chair", "car", "water",
    "painting", "sofa", "shelf", "house", "sea", "mirror", "rug", "field",
    "armchair", "seat", "fence", "desk", "rock", "wardrobe", "lamp",
    "bathtub", "railing", "cushion", "base", "box", "column", "signboard",
    "chest of drawers", "counter", "sand", "sink", "skyscraper", "fireplace",
    "refrigerator", "grandstand", "path", "stairs", "runway", "case",
    "pool table", "pillow", "screen door", "stairway", "river", "bridge",
    "bookcase", "blind", "coffee table", "toilet", "flower", "book", "hill",
    "bench", "countertop", "stove", "palm", "kitchen island", "computer",
    "swivel chair", "boat", "bar", "arcade machine", "hovel", "bus", "towel",
    "light", "truck", "tower", "chandelier", "awning", "streetlight",
    "booth", "television receiver", "airplane", "dirt track", "apparel",
    "pole", "land", "bannister", "escalator", "ottoman", "bottle", "buffet",
    "poster", "stage", "van", "ship", "fountain", "conveyer belt", "canopy",
    "washer", "plaything", "swimming pool", "stool", "barrel", "basket",
    "waterfall", "tent", "bag", "minibike", "cradle", "oven", "ball", "food",
    "step", "tank", "trade name", "microwave", "pot", "animal", "bicycle",
    "lake", "dishwasher", "screen", "blanket", "sculpture", "hood", "sconce",
    "vase", "traffic light", "tray", "ashcan", "fan", "pier", "crt screen",
    "plate", "monitor", "bulletin board", "shower", "radiator", "glass",
    "clock", "flag",
)

ADE20K_PALETTE = (
    (120, 120, 120), (180, 120, 120), (6, 230, 230), (80, 50, 50),
    (4, 200, 3), (120, 120, 80), (140, 140, 140), (204, 5, 255),
    (230, 230, 230), (4, 250, 7), (224, 5, 255), (235, 255, 7),
    (150, 5, 61), (120, 120, 70), (8, 255, 51), (255, 6, 82),
    (143, 255, 140), (204, 255, 4), (255, 51, 7), (204, 70, 3),
    (0, 102, 200), (61, 230, 250), (255, 6, 51), (11, 102, 255),
    (255, 7, 71), (255, 9, 224), (9, 7, 230), (220, 220, 220),
    (255, 9, 92), (112, 9, 255), (8, 255, 214), (7, 255, 224),
    (255, 184, 6), (10, 255, 71), (255, 41, 10), (7, 255, 255),
    (224, 255, 8), (102, 8, 255), (255, 61, 6), (255, 194, 7),
    (255, 122, 8), (0, 255, 20), (255, 8, 41), (255, 5, 153),
    (6, 51, 255), (235, 12, 255), (160, 150, 20), (0, 163, 255),
    (140, 140, 140), (250, 10, 15), (20, 255, 0), (31, 255, 0),
    (255, 31, 0), (255, 224, 0), (153, 255, 0), (0, 0, 255),
    (255, 71, 0), (0, 235, 255), (0, 173, 255), (31, 0, 255),
    (11, 200, 200), (255, 82, 0), (0, 255, 245), (0, 61, 255),
    (0, 255, 112), (0, 255, 133), (255, 0, 0), (255, 163, 0),
    (255, 102, 0), (194, 255, 0), (0, 143, 255), (51, 255, 0),
    (0, 82, 255), (0, 255, 41), (0, 255, 173), (10, 0, 255),
    (173, 255, 0), (0, 255, 153), (255, 92, 0), (255, 0, 255),
    (255, 0, 245), (255, 0, 102), (255, 173, 0), (255, 0, 20),
    (255, 184, 184), (0, 31, 255), (0, 255, 61), (0, 71, 255),
    (255, 0, 204), (0, 255, 194), (0, 255, 82), (0, 10, 255),
    (0, 112, 255), (51, 0, 255), (0, 194, 255), (0, 122, 255),
    (0, 255, 163), (255, 153, 0), (0, 255, 10), (255, 112, 0),
    (143, 255, 0), (82, 0, 255), (163, 255, 0), (255, 235, 0),
    (8, 184, 170), (133, 0, 255), (0, 255, 92), (184, 0, 255),
    (255, 0, 31), (0, 184, 255), (0, 214, 255), (255, 0, 112),
    (92, 255, 0), (0, 224, 255), (112, 224, 255), (70, 184, 160),
    (163, 0, 255), (153, 0, 255), (71, 255, 0), (255, 0, 163),
    (255, 204, 0), (255, 0, 143), (0, 255, 235), (133, 255, 0),
    (255, 0, 235), (245, 0, 255), (255, 0, 122), (255, 245, 0),
    (10, 190, 212), (214, 255, 0), (0, 204, 255), (20, 0, 255),
    (255, 255, 0), (0, 153, 255), (0, 41, 255), (0, 255, 204),
    (41, 0, 255), (41, 255, 0), (173, 0, 255), (0, 245, 255),
    (71, 0, 255), (122, 0, 255), (0, 255, 184), (0, 92, 255),
    (184, 255, 0), (0, 133, 255), (255, 214, 0), (25, 194, 194),
    (102, 255, 0), (92, 0, 255),
)
assert len(ADE20K_CLASSES) == ADE20K_NUM_CLASSES
assert len(ADE20K_PALETTE) == ADE20K_NUM_CLASSES


# ---------------------------------------------------------------------------
# transforms (pure functions of (img, mask, rng))
# ---------------------------------------------------------------------------


def resize(img, mask, scale=IMG_SCALE, *, ratio=None, keep_ratio=False):
    base_w, base_h = scale
    if ratio is not None:
        target_w, target_h = int(base_w * ratio), int(base_h * ratio)
    else:
        target_w, target_h = base_w, base_h
    if keep_ratio:
        h, w = img.shape[:2]
        f = min(target_w / w, target_h / h)
        rw, rh = int(w * f + 0.5), int(h * f + 0.5)
    else:
        rw, rh = target_w, target_h
    img = cv2.resize(img, (rw, rh), interpolation=cv2.INTER_LINEAR)
    if mask is not None:
        mask = cv2.resize(mask, (rw, rh), interpolation=cv2.INTER_NEAREST)
    return img, mask


def pad_to_size(img, mask, crop_size=CROP_SIZE, ignore_index=255):
    cw, ch = crop_size
    h, w = img.shape[:2]
    ph, pw = max(ch - h, 0), max(cw - w, 0)
    if ph or pw:
        img = cv2.copyMakeBorder(img, 0, ph, 0, pw, cv2.BORDER_CONSTANT, value=0)
        if mask is not None:
            mask = cv2.copyMakeBorder(
                mask, 0, ph, 0, pw, cv2.BORDER_CONSTANT, value=ignore_index
            )
    return img, mask


def random_crop(
    img, mask, rng: random.Random, crop_size=CROP_SIZE,
    *, cat_max_ratio=0.75, ignore_index=255, num_attempts=10,
):
    cw, ch = crop_size
    h, w = mask.shape
    if h < ch or w < cw:
        img, mask = pad_to_size(img, mask, crop_size, ignore_index)
        h, w = mask.shape
    img_crop = mask_crop = None
    for _ in range(num_attempts):
        top = rng.randint(0, h - ch)
        left = rng.randint(0, w - cw)
        img_crop = img[top : top + ch, left : left + cw]
        mask_crop = mask[top : top + ch, left : left + cw]
        valid = mask_crop != ignore_index
        if not valid.any():
            max_ratio = 0.0
        else:
            _, counts = np.unique(mask_crop[valid], return_counts=True)
            max_ratio = counts.max() / counts.sum()
        if max_ratio < cat_max_ratio:
            break
    return img_crop, mask_crop


def photometric_distortion(img, rng: random.Random):
    img = img.astype(np.float32)
    if rng.random() < 0.5:
        img += rng.uniform(-32, 32)
    mode = rng.randint(0, 1)

    def contrast(x):
        if rng.random() < 0.5:
            return x * rng.uniform(0.5, 1.5)
        return x

    if mode == 1:
        img = contrast(img)
    hsv = cv2.cvtColor(
        np.clip(img, 0, 255).astype(np.uint8), cv2.COLOR_RGB2HSV
    ).astype(np.float32)
    if rng.random() < 0.5:
        hsv[..., 1] *= rng.uniform(0.5, 1.5)
    if rng.random() < 0.5:
        hsv[..., 0] = np.mod(hsv[..., 0] + rng.uniform(-18, 18), 180)
    img = cv2.cvtColor(
        np.clip(hsv, 0, 255).astype(np.uint8), cv2.COLOR_HSV2RGB
    ).astype(np.float32)
    if mode == 0:
        img = contrast(img)
    return np.clip(img, 0, 255)


def normalize(img, mean=IMG_NORM_MEAN, std=IMG_NORM_STD):
    return (img.astype(np.float32) - mean) / std


def _native():
    """Opt-in C++ fast path (DAT_TPU_NATIVE=1; see native/imageops.cpp)."""
    from .. import native

    return native if native.enabled() else None


def reduce_zero_label(mask, ignore_index=255):
    # 0 -> ignore, k -> k-1; wrapped values (original 255) -> ignore
    # (reference datasets/ade20k.py:103-106)
    m = mask.astype(np.int32)
    m = np.where(m == 0, 256, m) - 1
    return np.where(m >= 254, ignore_index, m).astype(np.int32)


def train_transform(
    img, mask, rng: random.Random, *, crop_size=CROP_SIZE,
    img_scale=IMG_SCALE, ratio_range=(0.5, 2.0), cat_max_ratio=0.75,
    ignore_index=255,
):
    ratio = rng.uniform(*ratio_range)
    img, mask = resize(img, mask, img_scale, ratio=ratio)
    if img.shape[0] < crop_size[1] or img.shape[1] < crop_size[0]:
        img, mask = pad_to_size(img, mask, crop_size, ignore_index)
    img, mask = random_crop(
        img, mask, rng, crop_size,
        cat_max_ratio=cat_max_ratio, ignore_index=ignore_index,
    )
    img, mask = pad_to_size(img, mask, crop_size, ignore_index)
    if rng.random() < 0.5:
        img = np.ascontiguousarray(img[:, ::-1])
        mask = np.ascontiguousarray(mask[:, ::-1])
    nat = _native()
    if nat is not None:
        # fused single-pass photometric distortion + normalize + pad
        # (same random draws/order as the python path)
        bright = rng.uniform(-32, 32) if rng.random() < 0.5 else 0.0
        mode = rng.randint(0, 1)
        alpha = rng.uniform(0.5, 1.5) if rng.random() < 0.5 else 1.0
        sat = rng.uniform(0.5, 1.5) if rng.random() < 0.5 else 1.0
        hue = rng.uniform(-18, 18) if rng.random() < 0.5 else 0.0
        img = nat.photometric_distortion_u8(
            img.astype(np.uint8), brightness=bright, contrast=alpha,
            saturation=sat, hue=hue, contrast_first=(mode == 1),
        )
        img = nat.normalize_pad_f32(
            img, IMG_NORM_MEAN, IMG_NORM_STD, crop_size[1], crop_size[0]
        )
        _, mask = pad_to_size(
            np.zeros_like(mask, np.uint8), mask, crop_size, ignore_index
        )
        return img, mask.astype(np.int32)
    img = photometric_distortion(img, rng)
    img = normalize(img)
    img, mask = pad_to_size(img, mask, crop_size, ignore_index)
    return img.astype(np.float32), mask.astype(np.int32)


def val_transform(
    img, mask, *, crop_size=CROP_SIZE, img_scale=IMG_SCALE,
    keep_ratio=False, ignore_index=255,
):
    img, mask = resize(img, mask, img_scale, keep_ratio=keep_ratio)
    img = normalize(img)
    img, mask = pad_to_size(img, mask, crop_size, ignore_index)
    if mask is None:
        return img.astype(np.float32), None
    return img.astype(np.float32), mask.astype(np.int32)


# ---------------------------------------------------------------------------
# dataset
# ---------------------------------------------------------------------------


class ADE20KDataset:
    """File discovery + per-item decode/transform (reference layout rules
    at datasets/ade20k.py:50-71, incl. the alternative
    <root>/<split>/img layout)."""

    # checkpoint-meta / visualization tables (the mmseg dataset attributes
    # the reference stores in ckpt meta, tools/train.py:222-233)
    CLASSES = ADE20K_CLASSES
    PALETTE = ADE20K_PALETTE

    def __init__(
        self,
        root: str,
        split: str = "train",
        *,
        crop_size: Tuple[int, int] = CROP_SIZE,
        ignore_index: int = 255,
        keep_ratio_val: bool = False,
        seed: int = 0,
    ):
        assert split in {"train", "training", "val", "validation", "test"}
        self.root = Path(root)
        split_dir = {
            "train": "training", "training": "training",
            "val": "validation", "validation": "validation",
            "test": "validation",
        }[split]
        img_dir = self.root / "images" / split_dir
        ann_dir = self.root / "annotations" / split_dir
        if not img_dir.exists() or not ann_dir.exists():
            alt = self.root / split
            if (alt / "img").exists() and (alt / "annotations").exists():
                img_dir, ann_dir = alt / "img", alt / "annotations"
        if not img_dir.exists() or not ann_dir.exists():
            raise FileNotFoundError(
                f"ADE20K layout not found under {self.root} "
                f"(tried images/{split_dir} and {split}/img)"
            )
        self.images = sorted(img_dir.rglob("*.jpg"))
        self.masks = [ann_dir / (p.stem + ".png") for p in self.images]
        self.is_train = split in {"train", "training"}
        self.crop_size = crop_size
        self.ignore_index = ignore_index
        self.keep_ratio_val = keep_ratio_val
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Advance the aug RNG stream (called by DataLoader per epoch).

        Per-item RNG is keyed purely by (seed, epoch, idx), so a run is
        reproducible end to end — the reference gets the same property
        by seeding every library globally (tools/train.py:190-198) —
        while each epoch still sees fresh augmentations.

        CONTRACT: external consumers that iterate this dataset across
        epochs MUST advance the epoch (this method, or DataLoader's
        ``epoch=`` / ``infinite=True`` which call it) — otherwise every
        epoch replays bit-identical augmentations. The in-repo DataLoader
        warns when a shuffling loader is rebuilt without advancing it."""
        self.epoch = int(epoch)

    def __len__(self):
        return len(self.images)

    def load_raw(self, idx: int):
        img = cv2.imread(str(self.images[idx]), cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(self.images[idx])
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        mask = cv2.imread(str(self.masks[idx]), cv2.IMREAD_GRAYSCALE)
        if mask is None:
            raise FileNotFoundError(self.masks[idx])
        return img, reduce_zero_label(mask, self.ignore_index)

    def __getitem__(self, idx: int):
        img, mask = self.load_raw(idx)
        if self.is_train:
            rng = random.Random(f"{self.seed}:{self.epoch}:{idx}")
            img, mask = train_transform(
                img, mask, rng, crop_size=self.crop_size,
                ignore_index=self.ignore_index,
            )
        else:
            img, mask = val_transform(
                img, mask, crop_size=self.crop_size,
                keep_ratio=self.keep_ratio_val,
                ignore_index=self.ignore_index,
            )
        return {
            "image": img,
            "label": mask,
            "path": str(self.images[idx]),
        }
