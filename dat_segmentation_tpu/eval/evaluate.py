"""Dataset-level evaluation: streaming mIoU over ADE20K val.

The TPU equivalent of ``tools/test.py --eval mIoU [--aug-test]``
(reference: tools/test.py:264-317): per image, TTA-predict at original
resolution against the original-resolution GT, accumulate per-class
intersection/union, report mIoU/aAcc. Counters are plain int arrays, so
multi-host eval just sums them across processes
(jax.experimental.multihost_utils) instead of the reference's NCCL/tmpdir
result collection (tools/test.py:290-298).
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import numpy as np

from ..train.metrics import StreamingIoU
from .inference import SegInferencer

MS_RATIOS = (0.5, 0.75, 1.0, 1.25, 1.5, 1.75)  # tools/test.py:143-148


def evaluate_dataset(
    inferencer: SegInferencer,
    dataset,
    *,
    num_classes: int = 150,
    ignore_index: int = 255,
    img_scale=(2048, 512),
    aug_test: bool = False,
    keep_ratio: bool = True,
    max_images: Optional[int] = None,
    shard_info: Optional[tuple] = None,
    log_interval: int = 50,
    verbose: bool = True,
) -> dict:
    """Returns {'mIoU': float, 'aAcc': float, 'per_class_iou': list}."""
    ratios: Sequence[float] = MS_RATIOS if aug_test else (1.0,)
    flip = bool(aug_test)
    iou = StreamingIoU(num_classes, ignore_index)
    rank, world = shard_info or (0, 1)
    n = len(dataset) if max_images is None else min(max_images, len(dataset))
    t0 = time.time()
    done = 0
    for idx in range(rank, n, world):
        raw, gt = dataset.load_raw(idx)
        pred = inferencer.predict(
            raw,
            img_scale=img_scale,
            ratios=ratios,
            flip=flip,
            keep_ratio=keep_ratio,
            ori_shape=gt.shape,
        )
        iou.update(pred, gt)
        done += 1
        if verbose and done % log_interval == 0:
            rate = done / (time.time() - t0)
            print(
                f"[eval] {done} imgs, {rate:.2f} img/s, "
                f"running mIoU={iou.miou()*100:.2f}"
            )
    miou = iou.miou()
    from ..train.metrics import miou_from_totals

    _, per_class = miou_from_totals(iou.inter, iou.union)
    result = {
        "mIoU": miou,
        "aAcc": iou.accuracy(),
        "per_class_iou": [None if np.isnan(v) else float(v) for v in per_class],
        "num_images": done,
        "inter": iou.inter.tolist(),
        "union": iou.union.tolist(),
    }
    return result


def merge_shard_results(results: Sequence[dict], num_classes: int = 150) -> dict:
    """Sum per-shard counters (multi-host eval collection)."""
    inter = np.zeros(num_classes, np.int64)
    union = np.zeros(num_classes, np.int64)
    n = 0
    for r in results:
        inter += np.asarray(r["inter"], np.int64)
        union += np.asarray(r["union"], np.int64)
        n += r["num_images"]
    from ..train.metrics import miou_from_totals

    miou, per_class = miou_from_totals(inter, union)
    return {
        "mIoU": miou,
        "per_class_iou": [None if np.isnan(v) else float(v) for v in per_class],
        "num_images": n,
    }
