#!/usr/bin/env python
"""Evaluation CLI (reference: tools/test.py).

  python tools/test.py upn_tiny_160k_dp03_lr6 CHECKPOINT \
      --data-root /data/ade20k --eval mIoU
  python tools/test.py upn_tiny_160k_dp03_lr6 CKPT --aug-test   # MS+flip
  python tools/test.py fpn_tiny_80k_dp04_lr2 CKPT --mode slide

CHECKPOINT may be an orbax directory or a torch .pth (converted on load).
``--aug-test`` uses the reference's hard-coded ratios
[0.5, 0.75, 1.0, 1.25, 1.5, 1.75] + horizontal flip (tools/test.py:143-148).
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args():
    p = argparse.ArgumentParser(description="DAT-TPU evaluation")
    p.add_argument("config", help="preset name or python config file")
    p.add_argument("checkpoint", help="orbax dir or torch .pth")
    p.add_argument("--data-root", required=True)
    p.add_argument("--eval", default="mIoU", choices=["mIoU"])
    p.add_argument("--aug-test", action="store_true", help="MS+flip TTA")
    p.add_argument("--mode", default=None, choices=[None, "whole", "slide"])
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--out", default=None, help="json results path")
    p.add_argument("--show-dir", default=None,
                   help="write color prediction maps here")
    p.add_argument("--format-dir", default=None,
                   help="write submission-format grayscale maps (label+1, "
                        "the ADE20K convention; mmseg --format-only analog)")
    p.add_argument("--shard", default=None, metavar="RANK/WORLD",
                   help="evaluate a shard (merge with merge_shard_results)")
    p.add_argument("--batch-size", type=int, default=4,
                   help="bucket-batched whole-mode eval batch (1 = per-image)")
    p.add_argument("--pad-bucket", type=int, default=32,
                   help="whole-mode pad-to multiple. 32 (backbone stride) "
                        "is the smallest pad that bounds compile count; 1 "
                        "= mmseg-exact unpadded semantics (one compile per "
                        "distinct val shape — use for final parity runs)")
    p.add_argument("--postproc-workers", type=int, default=None,
                   help="host threads for single-scale resize+argmax "
                        "postproc (default: cpu_count-1, max 8)")
    p.add_argument("--no-exact", action="store_true",
                   help="disable exact padded inference (valid-extent "
                        "propagation makes the padded forward EQUAL the "
                        "unpadded mmseg whole-mode forward; disabling "
                        "reverts to plain zero-pad + slice)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host run: jax.distributed.initialize(), "
                        "shard by process, reduce counters in-run "
                        "(reference multi_gpu_test, tools/test.py:290-298)")
    p.add_argument("--set", nargs="*", default=[], metavar="KEY=VALUE",
                   help="dotted config overrides (must match the checkpoint)")
    return p.parse_args()


def main():
    args = parse_args()
    if args.distributed:
        import jax as _jax

        _jax.distributed.initialize()
    from tools.train import apply_overrides, load_config

    import jax.numpy as jnp

    from dat_segmentation_tpu.data.ade20k import ADE20KDataset
    from dat_segmentation_tpu.eval import SegInferencer, evaluate_dataset
    from dat_segmentation_tpu.models import build_model
    from dat_segmentation_tpu.train.checkpoint import (
        load_pretrained,
        merge_pretrained,
    )

    cfg = load_config(args.config)
    cfg = apply_overrides(cfg, args.set)
    model = build_model(cfg.model)

    import jax

    init_vars = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 64, 64, 3)),
        train=False,
    )
    loaded = load_pretrained(args.checkpoint, cfg.model)
    if "params" not in loaded:  # raw state tree from trainer checkpoints
        loaded = {
            "params": loaded.get("params", loaded),
            **(
                {"batch_stats": loaded["batch_stats"]}
                if "batch_stats" in loaded
                else {}
            ),
        }
    variables = merge_pretrained(jax.device_get(init_vars), loaded)

    inferencer = SegInferencer(
        model,
        variables,
        num_classes=cfg.model.num_classes,
        mode=args.mode or cfg.model.test_mode,
        crop_size=cfg.model.crop_size,
        stride=cfg.model.slide_stride,
        bucket=args.pad_bucket,
        exact=not args.no_exact,
        slide_batch=args.batch_size,
    )
    ds = ADE20KDataset(args.data_root, "val")
    shard_info = None
    if args.shard:
        rank, world = map(int, args.shard.split("/"))
        shard_info = (rank, world)
    elif args.distributed:
        shard_info = (jax.process_index(), jax.process_count())

    # --show-dir/--format-dir writers hook into the eval pass itself
    # (on_pred fires with each finalized prediction) — ONE inference pass
    # per image, like the reference painting from collected results
    # (tools/test.py:274-283)
    writers = []
    if args.format_dir:
        import numpy as np
        import cv2

        fmt_dir = Path(args.format_dir)
        fmt_dir.mkdir(parents=True, exist_ok=True)

        def write_format(idx, pred):
            # submission-format grayscale maps (label+1, ADE convention)
            cv2.imwrite(
                str(fmt_dir / f"{Path(ds.images[idx]).stem}.png"),
                (pred + 1).astype(np.uint8),
            )

        writers.append(write_format)
    if args.show_dir:
        import numpy as np
        import cv2

        from dat_segmentation_tpu.data.ade20k import (
            ADE20K_NUM_CLASSES,
            ADE20K_PALETTE,
        )

        show_dir = Path(args.show_dir)
        show_dir.mkdir(parents=True, exist_ok=True)
        if cfg.model.num_classes == ADE20K_NUM_CLASSES:
            # canonical 150-color palette (reference tools/test.py:229-233)
            palette = np.asarray(ADE20K_PALETTE, np.uint8)
        else:
            palette = (
                np.random.RandomState(42)
                .randint(0, 255, (cfg.model.num_classes, 3))
                .astype(np.uint8)
            )

        def write_show(idx, pred):
            cv2.imwrite(
                str(show_dir / f"{Path(ds.images[idx]).stem}.png"),
                cv2.cvtColor(palette[pred], cv2.COLOR_RGB2BGR),
            )

        writers.append(write_show)

    def on_pred(idx, pred):
        for w in writers:
            w(idx, pred)

    res = evaluate_dataset(
        inferencer,
        ds,
        num_classes=cfg.model.num_classes,
        img_scale=cfg.data.img_scale,
        aug_test=args.aug_test,
        max_images=args.max_images,
        shard_info=shard_info,
        batch_size=args.batch_size,
        distributed=args.distributed,
        on_pred=on_pred if writers else None,
        postproc_workers=args.postproc_workers,
    )
    # per-class table like mmseg's --eval mIoU output (dataset.evaluate
    # prints Class | IoU | Acc via prettytable; reference tools/test.py:300)
    from dat_segmentation_tpu.data.ade20k import ADE20K_CLASSES

    names = (
        ADE20K_CLASSES
        if cfg.model.num_classes == len(ADE20K_CLASSES)
        else [str(i) for i in range(cfg.model.num_classes)]
    )
    width = max(len(n) for n in names)
    print(f"{'Class':<{width}}  {'IoU':>6}  {'Acc':>6}")
    for name, iou_v, acc_v in zip(
        names, res["per_class_iou"], res["per_class_acc"]
    ):
        iou_s = "nan" if iou_v is None else f"{iou_v*100:.2f}"
        acc_s = "nan" if acc_v is None else f"{acc_v*100:.2f}"
        print(f"{name:<{width}}  {iou_s:>6}  {acc_s:>6}")
    print(f"mIoU: {res['mIoU']*100:.2f}  aAcc: {res['aAcc']*100:.2f}")
    if args.out:
        Path(args.out).write_text(json.dumps(res))


if __name__ == "__main__":
    main()
