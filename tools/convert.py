#!/usr/bin/env python
"""Convert a reference torch checkpoint (.pth) to an orbax directory.

  python tools/convert.py upn_tiny_160k_dp03_lr6 dat_upn_tiny.pth out_dir/
  python tools/convert.py cls_tiny_imagenet dat_pp_tiny_in1k.pth out/ --kind backbone

Users migrating from the reference can convert once and point every
tool at the orbax dir (train --pretrained / test / export also accept
.pth directly and convert on the fly via utils/torch_convert; this CLI
materializes the result and prints the merge report).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args():
    p = argparse.ArgumentParser(description="torch .pth -> orbax converter")
    p.add_argument("config", help="preset name or python config file")
    p.add_argument("checkpoint", help="torch .pth path")
    p.add_argument("output", help="orbax directory to write")
    p.add_argument("--kind", default="segmentor",
                   choices=["segmentor", "backbone", "classifier"])
    p.add_argument("--set", nargs="*", default=[], metavar="KEY=VALUE")
    return p.parse_args()


def main():
    args = parse_args()
    from tools.train import apply_overrides, load_config

    import jax
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from dat_segmentation_tpu.models import build_model
    from dat_segmentation_tpu.train.checkpoint import (
        load_pretrained,
        merge_pretrained,
    )

    cfg = load_config(args.config)
    cfg = apply_overrides(cfg, args.set)
    model = build_model(cfg.model)

    size = cfg.data.crop_size
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, size[1], size[0], 3), jnp.float32),
        train=False,
    )
    loaded = load_pretrained(args.checkpoint, cfg.model, kind=args.kind)
    merged, report = merge_pretrained(variables, loaded, return_report=True)

    out = Path(args.output).absolute()
    if out.exists():
        raise SystemExit(f"refusing to overwrite existing {out}")
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(out, jax.tree.map(np.asarray, merged))
    ckpt.wait_until_finished()
    n = sum(1 for _ in jax.tree_util.tree_leaves(merged))
    print(f"wrote {out} ({n} arrays; missing={len(report['missing'])} "
          f"unexpected={len(report['unexpected'])} "
          f"mismatched={len(report['mismatched'])})")
    if report["mismatched"]:
        raise SystemExit("shape mismatches found — wrong config?")


if __name__ == "__main__":
    main()
