"""Iteration-based segmentation trainer.

TPU re-design of the reference standalone loop (reference: new_train.py:73-268)
and the mmseg 160k recipe (configs/_base_/schedules/schedule_160k.py):
infinite-cycling sharded loader -> one fused pjit step (fwd+bwd+AdamW with
DP grad reduction compiled in) -> rank-0 logging every ``log_interval`` ->
periodic checkpoint + val mIoU with best tracking. Unlike the reference's
standalone loop (which restores weights only), resume restores step,
optimizer state and batch stats.
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.schema import TrainConfig
from ..data.ade20k import ADE20KDataset
from ..data.loader import DataLoader, device_prefetch
from ..eval import SegInferencer, evaluate_dataset
from ..models import build_model
from ..parallel import (
    TrainState,
    create_train_state,
    make_mesh,
    make_train_step,
)
from ..parallel.mesh import (
    local_batch_size,
    process_shard_info,
    shard_batch,
    shard_state,
)
from ..utils.logging import MetricLogger
from .checkpoint import CheckpointManager, load_pretrained, merge_pretrained
from .metrics import StreamingIoU
from .preemption import PreemptionGuard
from .optim import make_optimizer
from .schedules import warmup_cosine_schedule, warmup_poly_schedule


def _git_hash() -> Optional[str]:
    import subprocess

    try:
        return (
            subprocess.run(
                ["git", "rev-parse", "HEAD"],
                capture_output=True, timeout=5, cwd=Path(__file__).parent,
            )
            .stdout.decode()
            .strip()
            or None
        )
    except Exception:
        return None


def _dataset_meta(ds) -> dict:
    """CLASSES/PALETTE/git-hash checkpoint meta, like the reference's
    mmseg checkpoint_config meta (tools/train.py:222-233)."""
    meta = {"git": _git_hash()}
    for key in ("CLASSES", "PALETTE"):
        val = getattr(ds, key, None)
        if val is not None:
            meta[key] = [list(v) if isinstance(v, tuple) else v for v in val]
    return meta


def build_schedule(cfg: TrainConfig):
    sch = cfg.schedule
    if sch.policy == "poly":
        return warmup_poly_schedule(
            cfg.optimizer.lr,
            sch.max_iters,
            warmup_iters=sch.warmup_iters,
            warmup_ratio=sch.warmup_ratio,
            power=sch.power,
            min_lr=sch.min_lr,
        )
    return warmup_cosine_schedule(
        cfg.optimizer.lr,
        sch.max_iters,
        warmup_iters=sch.warmup_iters,
        warmup_ratio=sch.warmup_ratio,
        min_lr=sch.min_lr,
    )


def setup_state(cfg: TrainConfig, model, sample_input, *, pretrained=None):
    """Init params (+ optional pretrained merge) and optimizer state."""
    state = create_train_state(
        model,
        make_optimizer(build_schedule(cfg), None),
        jax.random.PRNGKey(cfg.seed),
        sample_input,
    )
    params, batch_stats = state.params, state.batch_stats
    if pretrained:
        loaded = load_pretrained(pretrained, cfg.model)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        merged = merge_pretrained(variables, loaded)
        params = merged["params"]
        batch_stats = merged.get("batch_stats", batch_stats)
    tx = make_optimizer(
        build_schedule(cfg),
        params,
        betas=cfg.optimizer.betas,
        weight_decay=cfg.optimizer.weight_decay,
        no_decay_keys=cfg.optimizer.no_decay_keys,
        grad_clip=cfg.optimizer.grad_clip,
    )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=batch_stats,
        tx=tx,
    )


def train_segmentation(
    cfg: TrainConfig,
    *,
    pretrained: Optional[str] = None,
    resume: bool = False,
    max_iters: Optional[int] = None,
    mesh=None,
    eval_max_images: Optional[int] = None,
    dataset_cls=ADE20KDataset,
    # bucket-batched in-run eval: per-image dispatch through the device
    # tunnel is the known-slow path and the 160k recipe evals 10x
    # (matches the tools/test.py default)
    eval_batch_size: int = 4,
):
    """Run the 160k-style iteration loop. Returns (state, history dict)."""
    mesh = mesh or make_mesh(cfg.mesh_shape)
    model = build_model(cfg.model)
    crop = cfg.data.crop_size
    sample = jnp.zeros((cfg.data.batch_size, crop[1], crop[0], 3))
    state = setup_state(cfg, model, sample, pretrained=pretrained)

    work_dir = Path(cfg.work_dir) / cfg.name
    ckpt = CheckpointManager(str(work_dir))
    logger = MetricLogger(work_dir / "train.log")

    compute_dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    fsdp = getattr(cfg, "fsdp", False)  # False | True | axis name
    if fsdp:
        # Place the state in its ZeRO/TP sharding BEFORE any restore so a
        # resume restores straight into the sharded layout — orbax reads
        # each process's own shards; no host-side full copy ever exists.
        state = shard_state(mesh, state, fsdp=fsdp)

    if resume:
        latest = ckpt.latest_step()
        if latest is not None:
            state = ckpt.restore(latest, target=state)
            logger.log(f"resumed from iter {latest}")

    def _save_tree(st: TrainState) -> dict:
        # fsdp: hand the sharded jax.Arrays straight to orbax — each
        # process serializes only its own shards (a jax.device_get of a
        # cross-process-sharded leaf is not even addressable). Replicated
        # runs keep host numpy copies (cheap; orbax writes once).
        if fsdp:
            return {"step": st.step, "params": st.params,
                    "opt_state": st.opt_state,
                    "batch_stats": st.batch_stats}
        return {"step": np.asarray(st.step),
                "params": jax.device_get(st.params),
                "opt_state": jax.device_get(st.opt_state),
                "batch_stats": jax.device_get(st.batch_stats)}

    def _host_variables(st: TrainState) -> dict:
        # eval-time host copy of params/batch_stats; fsdp shards are
        # all-gathered in-program first (parallel/mesh.py:gather_tree)
        tree = {"params": st.params}
        if st.batch_stats:
            tree["batch_stats"] = st.batch_stats
        from ..parallel.mesh import gather_tree

        return gather_tree(mesh, tree) if fsdp else jax.device_get(tree)

    train_ds = dataset_cls(
        cfg.data.data_root, "train",
        crop_size=crop, ignore_index=cfg.data.ignore_index, seed=cfg.seed,
    )
    val_ds = dataset_cls(cfg.data.data_root, "val", crop_size=crop)
    # cfg.data.batch_size is GLOBAL; each process loads its disjoint slice
    # (reference: DistributedSampler, new_train.py:121)
    loader = DataLoader(
        train_ds, local_batch_size(cfg.data.batch_size),
        shuffle=True, drop_last=True, infinite=True,
        num_threads=cfg.data.num_workers, seed=cfg.seed,
        shard_info=process_shard_info(),
    )
    batches = device_prefetch(iter(loader), lambda b: shard_batch(mesh, {
        "image": b["image"], "label": b["label"],
    }))

    step_fn = make_train_step(
        model, mesh,
        task="seg",
        aux_weight=cfg.model.aux_loss_weight,
        ignore_index=cfg.data.ignore_index,
        num_classes=cfg.model.num_classes,
        compute_dtype=compute_dtype,
        fsdp=fsdp, state=state,
    )
    schedule = build_schedule(cfg)
    rng = jax.random.PRNGKey(cfg.seed + 1)

    total = max_iters or cfg.schedule.max_iters
    train_iou = StreamingIoU(cfg.model.num_classes, cfg.data.ignore_index)
    best_miou = -1.0
    history = {"loss": [], "val_miou": []}
    t0 = time.time()
    it = int(state.step)
    # IoU counters accumulate ON DEVICE (async jnp adds); the host only
    # fetches them at log_interval — a per-step np.asarray would block on
    # a D2H transfer every iteration (reference's loop is equally
    # non-blocking, new_train.py:210-216).
    acc_inter = acc_union = None
    guard = PreemptionGuard()
    for batch in batches:
        if it >= total:
            break
        state, metrics = step_fn(state, batch, rng)
        it += 1

        # graceful preemption (SIGTERM): one final resumable checkpoint
        # at a step all processes agree on, then a clean exit — --resume
        # continues from here (the reference loses up to a full
        # checkpoint_interval of work)
        if guard.should_checkpoint(it):
            logger.log(f"preemption notice: checkpointing at iter {it}")
            ckpt.save(
                it,
                _save_tree(state),
                metadata=dict(
                    {"iter": it, "preempted": True,
                     "config": dataclasses.asdict(cfg)},
                    **_dataset_meta(train_ds),
                ),
            )
            guard.close()
            break
        if acc_inter is None:
            acc_inter, acc_union = metrics["inter"], metrics["union"]
        else:
            acc_inter = acc_inter + metrics["inter"]
            acc_union = acc_union + metrics["union"]

        if it % cfg.log_interval == 0:
            train_iou.inter += np.asarray(acc_inter, np.int64)
            train_iou.union += np.asarray(acc_union, np.int64)
            acc_inter = acc_union = None
            loss = float(metrics["loss"])
            lr = float(schedule(it))
            ips = cfg.data.batch_size * cfg.log_interval / (time.time() - t0)
            logger.log(
                f"iter {it}/{total} loss={loss:.4f} lr={lr:.3e} "
                f"train_mIoU={train_iou.miou()*100:.2f} {ips:.1f} img/s"
            )
            # persisted run history (jsonl + TB): the step already computes
            # grad_norm / update_ratio on device (parallel/train_step.py),
            # so logging them costs two scalar fetches per interval.
            logger.scalars(
                it, loss=loss, lr=lr, train_miou=train_iou.miou(),
                images_per_sec=ips,
                grad_norm=float(metrics["grad_norm"]),
                update_ratio=float(metrics["update_ratio"]),
            )
            history["loss"].append(loss)
            train_iou.reset()
            t0 = time.time()

        # ckpt.save must run on EVERY process (orbax barriers across all
        # hosts; rank-0-only calls deadlock — see CheckpointManager). Only
        # the primary host touches the filesystem, matching the
        # reference's rank-0 torch.save (new_train.py:228-238).
        if it % cfg.checkpoint_interval == 0:
            ckpt.save(
                it,
                _save_tree(state),
                metadata=dict(
                    {"iter": it, "config": dataclasses.asdict(cfg)},
                    **_dataset_meta(train_ds),
                ),
            )

        if it % cfg.eval_interval == 0 or it == total:
            variables = _host_variables(state)
            inf = SegInferencer(
                model, variables,
                num_classes=cfg.model.num_classes,
                mode=cfg.model.test_mode,
                compute_dtype=compute_dtype,
            )
            res = evaluate_dataset(
                inf, val_ds,
                num_classes=cfg.model.num_classes,
                max_images=eval_max_images,
                shard_info=process_shard_info(),
                batch_size=eval_batch_size,
                distributed=jax.process_count() > 1,
                verbose=False,
            )
            miou = res["mIoU"]
            history["val_miou"].append(miou)
            logger.log(f"iter {it} val mIoU={miou*100:.2f}")
            logger.scalars(it, val_miou=miou)
            if miou > best_miou:
                # miou is the distributed-reduced value — identical on
                # every process, so all ranks take this branch together
                # and orbax's internal barriers line up.
                best_miou = miou
                # `variables` is the eval-time host copy (fsdp shards
                # already gathered), so the best ckpt is always whole
                # arrays — loadable without the training mesh.
                ckpt.save(
                    "best",
                    {"params": variables["params"],
                     "batch_stats": variables.get("batch_stats", {})},
                    metadata=dict(
                        {"iter": it, "mIoU": miou},
                        **_dataset_meta(train_ds),
                    ),
                )
    guard.close()
    logger.close()
    # fold counters still pending on device so the reported running train
    # mIoU covers every iteration, not just full log_interval windows
    if acc_inter is not None:
        train_iou.inter += np.asarray(acc_inter, np.int64)
        train_iou.union += np.asarray(acc_union, np.int64)
    return state, history
