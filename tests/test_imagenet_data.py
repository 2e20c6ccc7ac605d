"""ImageNet pipeline tests: folder discovery, transforms, loader integration."""

import random
from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from dat_segmentation_tpu.data.imagenet import (
    IN_MEAN,
    IN_STD,
    ImageNetDataset,
    rand_augment,
    random_erasing,
    random_resized_crop,
    train_transform_cls,
    val_transform_cls,
)


def _layout(tmp_path, classes=3, per_class=2):
    for split in ("train", "val"):
        for c in range(classes):
            d = tmp_path / split / f"n{c:08d}"
            d.mkdir(parents=True, exist_ok=True)
            for i in range(per_class):
                img = np.random.RandomState(c * 10 + i).randint(
                    0, 255, (100 + 10 * i, 120, 3), np.uint8
                )
                cv2.imwrite(str(d / f"img_{i}.JPEG"), img)
    return tmp_path


def test_dataset_discovery_and_labels(tmp_path):
    root = _layout(tmp_path)
    ds = ImageNetDataset(root, "train", size=64)
    assert len(ds) == 6
    labels = sorted({int(ds[i]["label"]) for i in range(len(ds))})
    assert labels == [0, 1, 2]
    item = ds[0]
    assert item["image"].shape == (64, 64, 3)
    assert item["image"].dtype == np.float32


def test_val_transform_center_crop():
    img = np.random.RandomState(0).randint(0, 255, (300, 400, 3), np.uint8)
    out = val_transform_cls(img, size=224)
    assert out.shape == (224, 224, 3)
    # normalized range sanity
    assert np.abs(out).max() < 4.0


def test_random_resized_crop_shapes():
    img = np.random.RandomState(1).randint(0, 255, (80, 120, 3), np.uint8)
    for seed in range(5):
        out = random_resized_crop(img, random.Random(seed), 64)
        assert out.shape == (64, 64, 3)


def test_rand_augment_stays_uint8_range():
    img = np.random.RandomState(2).randint(0, 255, (64, 64, 3), np.uint8)
    for seed in range(8):
        out = rand_augment(img.copy(), random.Random(seed))
        assert out.dtype == np.uint8
        assert out.shape == img.shape


def test_train_transform_full_chain():
    img = np.random.RandomState(3).randint(0, 255, (90, 110, 3), np.uint8)
    for seed in range(4):
        out = train_transform_cls(img, random.Random(seed), size=64)
        assert out.shape == (64, 64, 3)
        assert out.dtype == np.float32
        assert np.isfinite(out).all()


def test_random_erasing_probability():
    img = np.zeros((64, 64, 3), np.float32)
    erased = 0
    for seed in range(40):
        out = random_erasing(img.copy(), random.Random(seed), p=0.25)
        if np.abs(out).sum() > 0:
            erased += 1
    assert 2 <= erased <= 20  # ~25% of 40
