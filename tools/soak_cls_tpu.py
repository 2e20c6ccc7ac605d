"""Classifier 224x224 train path proven on real TPU (VERDICT r4 #8).

Two legs:

1. step — jitted cls train step (fwd+bwd+AdamW, mixup/cutmix ON, soft-
   target CE) at batch 64 on synthetic on-device data: the clean
   device-side img/s number (reference recipe train_backbone.py:85-142).
2. soak — a short end-to-end `train_classifier` fragment over a
   synthetic ImageNet folder (real JPEG decode -> RandAugment ->
   erasing -> loader threads -> device), proving the whole path on
   hardware. NOTE on this 1-core host the input pipeline caps at ~196
   img/s (tools/bench_data.py), so the soak wall rate is host-bound;
   real TPU-VM hosts have 100+ cores.

Usage: python tools/soak_cls_tpu.py [--legs step,soak]
"""

from __future__ import annotations

import argparse
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


def leg_step(batch=64, iters=20):
    import numpy as np

    import jax
    import jax.numpy as jnp

    from dat_segmentation_tpu.configs import get_config
    from dat_segmentation_tpu.models import build_model
    from dat_segmentation_tpu.parallel import (
        TrainState,
        create_train_state,
        make_mesh,
        make_train_step,
    )
    from dat_segmentation_tpu.parallel.mesh import shard_batch
    from dat_segmentation_tpu.train import make_optimizer
    from dat_segmentation_tpu.train.schedules import warmup_cosine_schedule

    cfg = get_config("cls_tiny_imagenet")
    model = build_model(cfg.model)
    mesh = make_mesh({"data": 1})
    sched = warmup_cosine_schedule(cfg.optimizer.lr, 300 * 1000,
                                   warmup_iters=20 * 1000)
    sample = jnp.zeros((batch, 224, 224, 3))
    st = create_train_state(model, make_optimizer(sched, None),
                            jax.random.PRNGKey(0), sample)
    tx = make_optimizer(sched, st.params,
                        weight_decay=cfg.optimizer.weight_decay,
                        no_decay_keys=cfg.optimizer.no_decay_keys,
                        grad_clip=cfg.optimizer.grad_clip)
    st = TrainState(step=st.step, params=st.params, opt_state=tx.init(st.params),
                    batch_stats=st.batch_stats, tx=tx)
    step = make_train_step(model, mesh, task="cls",
                           num_classes=cfg.model.num_classes, mixup=True)
    rng = np.random.RandomState(0)
    b = shard_batch(mesh, {
        "image": jnp.asarray(rng.randn(batch, 224, 224, 3).astype(np.float32)),
        "label": jnp.asarray(rng.randint(0, 1000, (batch,)).astype(np.int32)),
    })
    key = jax.random.PRNGKey(1)
    compiled = step.lower(st, b, key).compile()

    def _fetch(x):
        np.asarray(jax.device_get(x[(0,) * x.ndim]))

    for _ in range(3):
        st, m = compiled(st, b, key)
    _fetch(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        st, m = compiled(st, b, key)
    _fetch(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "leg": "cls_train_step", "batch": batch,
        "ms": round(dt * 1e3, 1), "img_s": round(batch / dt, 1),
        "loss": round(float(m["loss"]), 3),
    }), flush=True)


def _synth_imagenet(root, classes=8, per_class=320, size=256):
    from pathlib import Path

    import numpy as np
    from PIL import Image

    root = Path(root)
    if (root / "train").exists():
        return root
    rng = np.random.RandomState(0)
    for split, n in (("train", per_class), ("val", 8)):
        for c in range(classes):
            d = root / split / f"class_{c:03d}"
            d.mkdir(parents=True, exist_ok=True)
            for i in range(n):
                arr = rng.randint(0, 256, (size, size, 3), np.uint8)
                Image.fromarray(arr).save(d / f"{i:05d}.jpg", quality=80)
    return root


def leg_soak(batch=64, steps=25):
    import dataclasses

    from dat_segmentation_tpu.configs import get_config
    from dat_segmentation_tpu.train.trainer_cls import train_classifier

    root = _synth_imagenet("/tmp/synth_imagenet")
    cfg = get_config("cls_tiny_imagenet")
    cfg = dataclasses.replace(
        cfg,
        name="soak_cls_tpu",
        work_dir="/tmp/soak_cls_work",
        data=dataclasses.replace(
            cfg.data, data_root=str(root), batch_size=batch, num_workers=4
        ),
        log_interval=5,
    )
    t0 = time.perf_counter()
    state, history = train_classifier(
        cfg, epochs=1, steps_per_epoch=steps, mixup=True, stats_interval=10**9
    )
    wall = time.perf_counter() - t0
    print(json.dumps({
        "leg": "cls_soak_e2e", "batch": batch, "steps": steps,
        "wall_s": round(wall, 1),
        "img_s_wall": round(batch * steps / wall, 1),
        "final_loss": round(history["train_loss"][-1], 3),
        "val_acc1": round(history["val_acc1"][-1], 4),
        "note": "wall rate is host-pipeline-bound on this 1-core host",
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--legs", default="step,soak")
    args = ap.parse_args()
    _cache()
    legs = set(args.legs.split(","))
    if "step" in legs:
        leg_step()
    if "soak" in legs:
        leg_soak()


if __name__ == "__main__":
    main()
