#!/usr/bin/env python
"""One-shot torch -> orbax checkpoint converter.

  python tools/convert.py upn_tiny_160k_dp03_lr6 dat_pp_t_upn.pth out_dir
  python tools/convert.py cls_tiny_imagenet backbone.pth out_dir --kind classifier

Converts reference/mmseg ``.pth`` state_dicts (reference checkpoints from
README.md:23-35) into this framework's variable trees and stores them as
an orbax checkpoint, reporting missing/unexpected keys (the reference's
tolerant-load semantics, models/backbones/loading.py:10-37).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser(description="torch -> orbax conversion")
    p.add_argument("config", help="preset name or python config file")
    p.add_argument("torch_ckpt")
    p.add_argument("out_dir")
    p.add_argument(
        "--kind", default="segmentor",
        choices=["segmentor", "classifier", "backbone"],
    )
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from tools.train import load_config
    from dat_segmentation_tpu.models import build_model
    from dat_segmentation_tpu.train.checkpoint import (
        load_pretrained,
        merge_pretrained,
    )

    cfg = load_config(args.config)
    loaded = load_pretrained(args.torch_ckpt, cfg.model, kind=args.kind)

    if args.kind != "backbone":
        model = build_model(cfg.model)
        init_vars = jax.device_get(
            model.init(
                {"params": jax.random.PRNGKey(0)},
                jnp.zeros((1, 64, 64, 3)),
                train=False,
            )
        )
        variables = merge_pretrained(init_vars, loaded)
    else:
        variables = loaded

    out = Path(args.out_dir).absolute()
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(out, variables)
    ckpt.wait_until_finished()
    n = len(jax.tree.leaves(variables))
    print(f"wrote {n} arrays to {out}")


if __name__ == "__main__":
    main()
