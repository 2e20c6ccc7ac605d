"""Model-level ablation benchmark: where does forward time go?

Times the DAT-T++ SemanticFPN forward with components ablated via config
surgery, using bench.py's trusted methodology (one jit program, warmup,
device_get sync — per-part microbenches are unreliable through the axon
tunnel because dispatch overhead dominates small programs).

Variants: full | backbone | allx | nope | nolpu | plainmlp

Usage: python tools/bench_ablate.py [--batch 8] [--variants full allx ...]
"""

import argparse
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

SHAPE = (512, 512)


def _fetch(tree):
    for leaf in jax.tree.leaves(tree):
        np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))


def surgery(cfg, variant):
    b = cfg.model.backbone
    if variant == "allx":
        b = dataclasses.replace(
            b, stage_spec=tuple(tuple("X" for _ in s) for s in b.stage_spec)
        )
    elif variant == "allx_plainmlp":  # allx minus the 3x3 dwc in ConvMLP
        b = dataclasses.replace(
            b,
            stage_spec=tuple(tuple("X" for _ in s) for s in b.stage_spec),
            use_dwc_mlps=(False,) * 4,
        )
    elif variant == "allx_nolpu":  # allx minus the per-block LPU dwconv
        b = dataclasses.replace(
            b,
            stage_spec=tuple(tuple("X" for _ in s) for s in b.stage_spec),
            use_lpus=(False,) * 4,
        )
    elif variant == "allx_conv1":  # X-block window conv k=7 -> k=1
        b = dataclasses.replace(
            b,
            stage_spec=tuple(tuple("X" for _ in s) for s in b.stage_spec),
            window_sizes=(1, 1, 1, 1),
        )
    elif variant == "nope":
        b = dataclasses.replace(b, use_pes=(False,) * 4)
    elif variant == "nolpu":
        b = dataclasses.replace(b, use_lpus=(False,) * 4)
    elif variant == "plainmlp":
        b = dataclasses.replace(b, use_dwc_mlps=(False,) * 4)
    elif variant == "xlaimpl":
        b = dataclasses.replace(b, kernel_impl="xla")
    elif variant not in ("full", "backbone"):
        raise ValueError(variant)
    return dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, backbone=b)
    )


def bench_train_variant(cfg, variant, batch, iters):
    """Full train step (fwd+bwd+AdamW) with the variant's config surgery —
    attributes BACKWARD time the same way bench_variant attributes forward."""
    from dat_segmentation_tpu.models import build_model
    from dat_segmentation_tpu.parallel import (
        TrainState,
        create_train_state,
        make_mesh,
        make_train_step,
    )
    from dat_segmentation_tpu.parallel.mesh import shard_batch
    from dat_segmentation_tpu.train import make_optimizer, warmup_poly_schedule

    cfg = surgery(cfg, variant)
    model = build_model(cfg.model)
    mesh = make_mesh({"data": 1})
    sched = warmup_poly_schedule(cfg.optimizer.lr, cfg.schedule.max_iters)
    sample = jnp.zeros((batch, *SHAPE, 3))
    st = create_train_state(
        model, make_optimizer(sched, None), jax.random.PRNGKey(0), sample
    )
    tx = make_optimizer(sched, st.params,
                        weight_decay=cfg.optimizer.weight_decay,
                        no_decay_keys=cfg.optimizer.no_decay_keys)
    st = TrainState(step=st.step, params=st.params, opt_state=tx.init(st.params),
                    batch_stats=st.batch_stats, tx=tx)
    step = make_train_step(
        model, mesh, task="seg", num_classes=cfg.model.num_classes,
        aux_weight=cfg.model.aux_loss_weight,
    )
    rng = np.random.RandomState(0)
    b = shard_batch(mesh, {
        "image": jnp.asarray(rng.randn(batch, *SHAPE, 3).astype(np.float32)),
        "label": jnp.asarray(
            rng.randint(0, 150, (batch, *SHAPE)).astype(np.int32)
        ),
    })
    key = jax.random.PRNGKey(1)
    for _ in range(3):
        st, m = step(st, b, key)
    _fetch(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        st, m = step(st, b, key)
    _fetch(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(
        f"  {variant} [train]: {dt*1e3:.1f} ms  ({batch/dt:.1f} img/s)",
        flush=True,
    )
    return dt


def bench_variant(cfg, variant, batch, iters):
    from dat_segmentation_tpu.models import build_model

    cfg = surgery(cfg, variant)
    if variant == "backbone":
        from dat_segmentation_tpu.models.builder import build_backbone

        model = build_backbone(cfg.model.backbone)
        apply_kw = {}
    else:
        model = build_model(cfg.model)
        apply_kw = dict(train=False)

    x = jnp.zeros((batch, *SHAPE, 3), jnp.bfloat16)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, **apply_kw)
    variables = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16)
        if jnp.issubdtype(v.dtype, jnp.floating)
        else v,
        variables,
    )

    @jax.jit
    def fwd(image):
        return model.apply(variables, image, **apply_kw)

    compiled = fwd.lower(x).compile()
    cost = compiled.cost_analysis()
    flops = float(cost.get("flops", 0.0)) if cost else 0.0
    for _ in range(3):
        _fetch(fwd(x))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fwd(x)
    _fetch(out)
    dt = (time.perf_counter() - t0) / iters
    print(
        f"  {variant}: {dt*1e3:.1f} ms  ({batch/dt:.1f} img/s, "
        f"{flops/batch/1e9:.1f} GF/img, {flops/dt/1e12:.1f} TF/s)",
        flush=True,
    )
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--config", default="fpn_tiny_80k_dp04_lr2")
    ap.add_argument(
        "--variants", nargs="*",
        default=["full", "backbone", "allx", "nope", "nolpu", "plainmlp"],
    )
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--train", action="store_true",
                    help="time the full train step per variant instead")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from dat_segmentation_tpu.configs import get_config

    cfg = get_config(args.config)
    print(f"{args.config} @ {SHAPE}, batch {args.batch}"
          f"{' [train]' if args.train else ''}:", flush=True)
    for v in args.variants:
        if args.train:
            bench_train_variant(cfg, v, args.batch, args.iters)
        else:
            bench_variant(cfg, v, args.batch, args.iters)


if __name__ == "__main__":
    main()
