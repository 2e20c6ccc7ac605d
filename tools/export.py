#!/usr/bin/env python
"""Export a trained model to a self-contained serving artifact.

  python tools/export.py upn_tiny_160k_dp03_lr6 CKPT --output art/ \
      --shapes 512x512,512x2048
  python tools/export.py cls_tiny CKPT --task cls --shapes 224x224 --batch 64

CKPT may be an orbax directory, a torch .pth (converted on load), or
'random' for a smoke export with freshly initialized weights. The
artifact directory (StableHLO entries + meta.json) is loadable with
``dat_segmentation_tpu.serving.ServingModel`` — no model code needed.
``--check`` reloads the artifact and verifies it against the live model.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args():
    p = argparse.ArgumentParser(description="DAT-TPU serving export")
    p.add_argument("config", help="preset name or python config file")
    p.add_argument("checkpoint", help="orbax dir, torch .pth, or 'random'")
    p.add_argument("--output", required=True, help="artifact directory")
    p.add_argument("--task", default="seg", choices=["seg", "cls"])
    p.add_argument("--shapes", default="512x512",
                   help="comma list of HxW entries, e.g. 512x512,512x2048")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--platforms", default=None,
                   help="comma list (e.g. cpu,tpu); default: current backend")
    p.add_argument("--no-portable", action="store_true",
                   help="keep the config's kernel_impl (Pallas custom calls "
                        "carry narrower serialization guarantees)")
    p.add_argument("--check", action="store_true",
                   help="reload the artifact and compare vs the live model")
    p.add_argument("--set", nargs="*", default=[], metavar="KEY=VALUE")
    return p.parse_args()


def main():
    args = parse_args()
    from tools.train import apply_overrides, load_config

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dat_segmentation_tpu.models import build_model
    from dat_segmentation_tpu.serving import (
        ServingModel,
        export_classifier,
        export_segmentor,
        save_artifact,
    )
    from dat_segmentation_tpu.train.checkpoint import (
        load_pretrained,
        merge_pretrained,
    )

    cfg = load_config(args.config)
    cfg = apply_overrides(cfg, args.set)
    model = build_model(cfg.model)

    shapes = []
    for tok in args.shapes.split(","):
        h, w = tok.lower().split("x")
        shapes.append((int(h), int(w)))

    init_shape = (1, shapes[0][0], shapes[0][1], 3)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros(init_shape, jnp.float32),
        train=False,
    )
    if args.checkpoint != "random":
        kind = "classifier" if args.task == "cls" else "segmentor"
        loaded = load_pretrained(args.checkpoint, cfg.model, kind=kind)
        variables = merge_pretrained(variables, loaded)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    platforms = args.platforms.split(",") if args.platforms else None
    export_fn = export_classifier if args.task == "cls" else export_segmentor
    entries = {}
    for h, w in shapes:
        name = f"{args.task}_{h}x{w}_b{args.batch}"
        print(f"exporting {name} ...")
        entries[name] = export_fn(
            cfg.model, variables,
            batch=args.batch, input_size=(h, w), compute_dtype=dtype,
            platforms=platforms, portable=not args.no_portable,
        )

    meta_kwargs = {}
    if args.task == "seg" and cfg.model.num_classes == 150:
        from dat_segmentation_tpu.data.ade20k import (
            ADE20K_CLASSES,
            ADE20K_PALETTE,
        )

        meta_kwargs = {"classes": ADE20K_CLASSES, "palette": ADE20K_PALETTE}
    out = save_artifact(
        args.output, entries,
        task="segmentor" if args.task == "seg" else "classifier",
        model_cfg=cfg.model, num_classes=cfg.model.num_classes,
        **meta_kwargs,
    )
    total = sum((out / e["file"]).stat().st_size
                for e in ServingModel.load(out).entries.values())
    print(f"wrote {out} ({len(entries)} entries, {total/1e6:.1f} MB)")

    if args.check:
        srv = ServingModel.load(out)
        rng = np.random.RandomState(0)
        for (h, w), (name, _) in zip(shapes, entries.items()):
            x = rng.randn(args.batch, h, w, 3).astype(np.float32)
            got = srv(name, x)
            want = np.asarray(model.apply(
                jax.tree.map(
                    lambda v: v.astype(dtype)
                    if jnp.issubdtype(v.dtype, jnp.floating) else v,
                    variables,
                ),
                jnp.asarray(x).astype(dtype), train=False,
                **({"upsample": False} if args.task == "seg" else {}),
            ), dtype=np.float32)
            err = float(np.abs(got - want).max())
            rel = err / (float(np.abs(want).max()) + 1e-9)
            print(f"check {name}: max|artifact - live| = {err:.3e} "
                  f"(rel {rel:.3e})")
            # recompile noise only (same weights, same dtype): anything
            # beyond ~1e-3 relative means a real lowering divergence
            assert rel < 1e-3, (err, rel)
        print("check OK")


if __name__ == "__main__":
    main()
