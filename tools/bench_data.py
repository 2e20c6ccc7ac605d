"""Host input-pipeline throughput benchmark (no TPU needed).

Synthesizes an ADE20K-layout dataset of realistic-size images on disk and
measures DataLoader throughput through the full train transform (random
scale, cat-max-ratio crop, flip, photometric distortion, normalize, pad)
— with and without the C++ fast path (DAT_TPU_NATIVE=1) — plus the
ImageNet 224 classifier pipeline. A chip trains at ~20-40 img/s
(bench.py --train), so the host pipeline must sustain more than that per
host to not starve the device.

Usage: python tools/bench_data.py [--images 48] [--threads 4] [--batches 24]
"""

import argparse
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def make_ade(root: Path, n: int, hw=(512, 683)):
    import cv2

    img_dir = root / "images" / "training"
    ann_dir = root / "annotations" / "training"
    img_dir.mkdir(parents=True, exist_ok=True)
    ann_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        h = hw[0] + (i % 5) * 37
        w = hw[1] + (i % 7) * 29
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        mask = rng.randint(0, 150, (h, w), np.uint8)
        cv2.imwrite(str(img_dir / f"im_{i}.jpg"), img)
        cv2.imwrite(str(ann_dir / f"im_{i}.png"), mask)


def bench_seg(root: Path, batches: int, batch: int, threads: int) -> float:
    from dat_segmentation_tpu.data.ade20k import ADE20KDataset
    from dat_segmentation_tpu.data.loader import DataLoader

    ds = ADE20KDataset(root, "train")
    loader = DataLoader(
        ds, batch, shuffle=True, drop_last=True, infinite=True,
        num_threads=threads, seed=0,
    )
    it = iter(loader)
    next(it)  # warm caches / thread spin-up
    t0 = time.perf_counter()
    for _ in range(batches):
        b = next(it)
    dt = time.perf_counter() - t0
    assert b["image"].shape[1:3] == (512, 512)
    return batches * batch / dt


def bench_imagenet(root: Path, batches: int, batch: int, threads: int) -> float:
    import cv2

    from dat_segmentation_tpu.data.imagenet import ImageNetDataset
    from dat_segmentation_tpu.data.loader import DataLoader

    # class-folder layout
    rng = np.random.RandomState(1)
    for c in range(4):
        d = root / "train" / f"class_{c}"
        d.mkdir(parents=True, exist_ok=True)
        for i in range(8):
            img = rng.randint(0, 255, (320, 480, 3), np.uint8)
            cv2.imwrite(str(d / f"{i}.jpg"), img)
    ds = ImageNetDataset(root, "train")
    loader = DataLoader(
        ds, batch, shuffle=True, drop_last=True, infinite=True,
        num_threads=threads, seed=0,
    )
    it = iter(loader)
    next(it)
    t0 = time.perf_counter()
    for _ in range(batches):
        b = next(it)
    dt = time.perf_counter() - t0
    assert b["image"].shape[1:3] == (224, 224)
    return batches * batch / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=48)
    ap.add_argument("--batches", type=int, default=24)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--threads", type=int, default=4)
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as tmp:
        root = Path(tmp)
        make_ade(root, args.images)
        for native in ("0", "1"):
            os.environ["DAT_TPU_NATIVE"] = native
            ips = bench_seg(root, args.batches, args.batch, args.threads)
            label = "C++ fast path" if native == "1" else "python/cv2"
            print(f"ADE20K train pipeline [{label}]: {ips:.1f} img/s "
                  f"({args.threads} threads)", flush=True)
        os.environ.pop("DAT_TPU_NATIVE", None)
        ips = bench_imagenet(root, args.batches, 32, args.threads)
        print(f"ImageNet-224 train pipeline: {ips:.1f} img/s "
              f"({args.threads} threads)", flush=True)


if __name__ == "__main__":
    main()
