"""Segmentation 160k-recipe train loop proven end-to-end on real TPU.

The classifier path has this proof (tools/soak_cls_tpu.py); this is the
segmentation counterpart: a short `train_segmentation` fragment over a
synthetic ADE20K-layout folder — real JPEG/PNG decode -> the full
reference aug pipeline (scale jitter, crop w/ cat_max_ratio, PMD, pad)
-> threaded loader -> device prefetch -> the production train step
(bf16 fwd+bwd+AdamW + in-step IoU counters) -> MetricLogger jsonl/TB
scalars -> orbax checkpoint -> one whole-mode bucket-batched val eval —
all on hardware, mirroring the reference recipe end to end
(reference new_train.py:161-260).

Compile reuse: batch 16 @ 512x512 matches bench.py's train leg and the
val shapes match tools/bench_eval_e2e.py's bucket set, so a warmed
.xla_cache makes this run in minutes (the 1-core host input pipeline is
the wall-rate bound; see CLAUDE.md).

Usage: python tools/soak_seg_tpu.py [--steps 25] [--batch 16]
Prints one JSON line: {"leg": "seg_soak_e2e", ...}
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")


def _cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", ".xla_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # noqa: BLE001
        print(f"# no persistent cache: {e!r}", file=sys.stderr)


# val shapes drawn from the same envelope tools/bench_eval_e2e.py uses,
# so the whole-mode eval at the soak's final step hits already-compiled
# bucket programs
VAL_SHAPES = [(512, 683), (683, 512), (512, 768), (384, 512),
              (512, 512), (768, 1024), (512, 683), (683, 512)]
TRAIN_SHAPES = [(512, 683), (683, 512), (512, 768), (640, 853)]


def _synth_ade(root, n_train=96, n_val=8):
    """ADE20K-layout folder of random JPEGs + label PNGs.

    Labels use the raw ADE convention (0 = to-be-ignored background,
    1..150 = classes) so reduce_zero_label exercises its real remap.
    """
    from pathlib import Path

    import cv2
    import numpy as np

    root = Path(root)
    if (root / "images" / "training").exists():
        return root
    rng = np.random.RandomState(0)
    for split, n, shapes in (("training", n_train, TRAIN_SHAPES),
                             ("validation", n_val, VAL_SHAPES)):
        img_dir = root / "images" / split
        ann_dir = root / "annotations" / split
        img_dir.mkdir(parents=True, exist_ok=True)
        ann_dir.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            h, w = shapes[i % len(shapes)]
            img = rng.randint(0, 256, (h, w, 3), np.uint8)
            # piecewise-constant label blobs (random per-pixel labels make
            # cat_max_ratio/crop retries meaningless); coarse 32px cells
            cells = rng.randint(0, 151, (h // 32 + 1, w // 32 + 1), np.uint8)
            mask = np.kron(cells, np.ones((32, 32), np.uint8))[:h, :w]
            cv2.imwrite(str(img_dir / f"ADE_{split}_{i:08d}.jpg"), img,
                        [cv2.IMWRITE_JPEG_QUALITY, 85])
            cv2.imwrite(str(ann_dir / f"ADE_{split}_{i:08d}.png"), mask)
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--eval-images", type=int, default=8)
    ap.add_argument("--work-dir", default="/tmp/soak_seg_work")
    args = ap.parse_args()
    _cache()

    from dat_segmentation_tpu.configs import get_config
    from dat_segmentation_tpu.train.trainer_seg import train_segmentation

    root = _synth_ade("/tmp/synth_ade20k")
    cfg = get_config("upn_tiny_160k_dp03_lr6")
    cfg = dataclasses.replace(
        cfg,
        name="soak_seg_tpu",
        work_dir=args.work_dir,
        data=dataclasses.replace(
            cfg.data, data_root=str(root), batch_size=args.batch,
            num_workers=4,
        ),
        log_interval=5,
        checkpoint_interval=args.steps,   # one resumable ckpt at the end
        eval_interval=10 ** 9,            # trainer still evals at it==total
    )
    t0 = time.perf_counter()
    state, history = train_segmentation(
        cfg, max_iters=args.steps, eval_max_images=args.eval_images,
        eval_batch_size=4,
    )
    wall = time.perf_counter() - t0
    print(json.dumps({
        "leg": "seg_soak_e2e",
        "batch": args.batch,
        "steps": args.steps,
        "wall_s": round(wall, 1),
        "img_s_wall": round(args.batch * args.steps / wall, 1),
        "loss_first": round(history["loss"][0], 3),
        "loss_last": round(history["loss"][-1], 3),
        "val_miou": round(history["val_miou"][-1], 4) if history["val_miou"]
        else None,
        "note": "wall rate is host-pipeline-bound on this 1-core host "
                "(~23 img/s aug ceiling, tools/bench_data.py); the step "
                "itself is bench.py's 48 img/s program",
    }), flush=True)


if __name__ == "__main__":
    main()
