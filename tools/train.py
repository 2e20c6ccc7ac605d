#!/usr/bin/env python
"""Training CLI (reference: tools/train.py + new_train.py combined).

Examples:
  python tools/train.py upn_tiny_160k_dp03_lr6 --data-root /data/ade20k
  python tools/train.py fpn_tiny_80k_dp04_lr2 --data-root /data/ade20k \
      --pretrained backbone.pth --work-dir work_dirs/fpn_t
  python tools/train.py cls_tiny_imagenet --data-root /data/imagenet
  python tools/train.py my_config.py --data-root /data/ade20k  # mmseg dict

Config overrides use dotted keys, mirroring mmseg --cfg-options
(reference tools/train.py:77-86):
  --set data.batch_size=8 schedule.max_iters=80000
"""

import argparse
import ast
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args():
    p = argparse.ArgumentParser(description="DAT-TPU training")
    p.add_argument("config", help="preset name or python config file")
    p.add_argument("--data-root", required=True)
    p.add_argument("--work-dir", default=None)
    p.add_argument("--pretrained", default=None,
                   help="orbax dir or torch .pth (auto-converted)")
    p.add_argument("--resume", action="store_true",
                   help="auto-resume from latest checkpoint in work dir")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--diff-seed", action="store_true",
                   help="reference-CLI parity flag (tools/train.py:190-198: "
                   "per-rank seed offsets so DDP ranks draw different "
                   "dropout masks). A no-op here BY DESIGN: dropout masks "
                   "are generated inside the pjit program from a replicated "
                   "key over the GLOBAL batch, so every sample already gets "
                   "a distinct mask, and per-item aug RNG is keyed by "
                   "(seed, epoch, global idx). Per-process seed divergence "
                   "would instead break GSPMD's replicated-input invariant "
                   "and loader shard disjointness.")
    p.add_argument("--max-iters", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None, help="classifier only")
    p.add_argument("--no-mixup", action="store_true")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() (one process/host)")
    p.add_argument("--eval-batch-size", type=int, default=1,
                   help="bucket-batched in-training val (seg only)")
    p.add_argument("--set", nargs="*", default=[], metavar="KEY=VALUE",
                   help="dotted config overrides")
    return p.parse_args()


def load_config(name_or_path: str):
    from dat_segmentation_tpu.configs import get_config
    from dat_segmentation_tpu.configs.mmseg_compat import (
        load_python_config,
        model_config_from_mmseg,
    )
    from dat_segmentation_tpu.configs.schema import TrainConfig

    if name_or_path.endswith(".py"):
        model = model_config_from_mmseg(load_python_config(name_or_path))
        return TrainConfig(name=Path(name_or_path).stem, model=model)
    return get_config(name_or_path)


def apply_overrides(cfg, pairs):
    from dat_segmentation_tpu.configs.schema import replace

    for pair in pairs:
        key, _, raw = pair.partition("=")
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw
        cfg = replace(cfg, **{key: value})
    return cfg


def main():
    args = parse_args()
    if args.multihost:
        import jax

        jax.distributed.initialize()

    from dat_segmentation_tpu.configs.schema import replace

    cfg = load_config(args.config)
    cfg = replace(cfg, **{"data.data_root": args.data_root, "seed": args.seed})
    if args.diff_seed:
        print("--diff-seed: no-op on TPU/SPMD (see --help) — dropout masks "
              "and augmentations are already per-sample-distinct globally")
    if args.work_dir:
        cfg = replace(cfg, work_dir=args.work_dir)
    cfg = apply_overrides(cfg, args.set)

    if cfg.model.decode_head.type == "ClsHead":
        from dat_segmentation_tpu.train.trainer_cls import train_classifier

        train_classifier(
            cfg,
            pretrained=args.pretrained,
            resume=args.resume,
            epochs=args.epochs,
            mixup=not args.no_mixup,
        )
    else:
        from dat_segmentation_tpu.train.trainer_seg import train_segmentation

        train_segmentation(
            cfg,
            pretrained=args.pretrained,
            resume=args.resume,
            max_iters=args.max_iters,
            eval_batch_size=args.eval_batch_size,
        )


if __name__ == "__main__":
    main()
