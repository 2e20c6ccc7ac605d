"""Epoch-based ImageNet classifier pretraining.

TPU re-design of the reference backbone trainer (reference:
train_backbone.py:85-331): AdamW + cosine schedule with linear warmup
(per-iteration stepping), grad-clip 5.0, mixup/cutmix + soft-target CE
(else label-smoothing CE), per-epoch validation with top-1/5, epoch/best
checkpoints plus backbone-only state export for seg fine-tuning. Metric
reduction across hosts is a jnp sum over shard counters instead of
NCCL all_reduce (train_backbone.py:161-164).
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
from ..data.imagenet import ImageNetDataset
from ..data.loader import DataLoader, device_prefetch
from ..models import build_model
from ..parallel import (
    TrainState,
    create_train_state,
    make_cls_metric_step,
    make_mesh,
    make_train_step,
)
from ..parallel.mesh import (
    local_batch_size,
    process_shard_info,
    shard_batch,
    shard_state,
)
from ..utils.logging import MetricLogger, weight_stats_on_device
from .checkpoint import CheckpointManager, load_pretrained, merge_pretrained, save_backbone_only
from .optim import make_optimizer
from .preemption import PreemptionGuard
from .trainer_seg import build_schedule


def train_classifier(
    cfg: TrainConfig,
    *,
    pretrained: Optional[str] = None,
    resume: bool = False,
    epochs: Optional[int] = None,
    mesh=None,
    mixup: bool = True,
    steps_per_epoch: Optional[int] = None,
    dataset_cls=ImageNetDataset,
    stats_interval: int = 100,
):
    mesh = mesh or make_mesh(cfg.mesh_shape)
    model = build_model(cfg.model)
    size = cfg.data.crop_size[0]
    # cfg.data.batch_size is the GLOBAL batch; each process loads a
    # disjoint 1/process_count slice (reference: DistributedSampler,
    # imagenet.py:99-100)
    shard = process_shard_info()
    local_bs = local_batch_size(cfg.data.batch_size)
    sample = jnp.zeros((cfg.data.batch_size, size, size, 3))

    state = create_train_state(
        model, make_optimizer(build_schedule(cfg), None),
        jax.random.PRNGKey(cfg.seed), sample,
    )
    params, batch_stats = state.params, state.batch_stats
    if pretrained:
        loaded = load_pretrained(pretrained, cfg.model, kind="classifier")
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        merged = merge_pretrained(variables, loaded)
        params = merged["params"]
        batch_stats = merged.get("batch_stats", batch_stats)

    train_ds = dataset_cls(cfg.data.data_root, "train", size=size,
                           seed=cfg.seed)
    val_ds = dataset_cls(cfg.data.data_root, "val", size=size)
    n_epochs = epochs or cfg.schedule.max_iters  # cls schedule in epochs
    spe = steps_per_epoch or max(len(train_ds) // cfg.data.batch_size, 1)

    # per-iteration schedule over total steps (train_backbone.py:250-264)
    sched_cfg = dataclasses.replace(
        cfg.schedule,
        max_iters=n_epochs * spe,
        warmup_iters=cfg.schedule.warmup_iters * spe,
    )
    cfg_iter = dataclasses.replace(cfg, schedule=sched_cfg)
    tx = make_optimizer(
        build_schedule(cfg_iter), params,
        betas=cfg.optimizer.betas,
        weight_decay=cfg.optimizer.weight_decay,
        no_decay_keys=cfg.optimizer.no_decay_keys,
        grad_clip=cfg.optimizer.grad_clip,
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params), batch_stats=batch_stats, tx=tx,
    )

    work_dir = Path(cfg.work_dir) / cfg.name
    ckpt = CheckpointManager(str(work_dir))
    logger = MetricLogger(work_dir / "train.log")

    compute_dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    fsdp = getattr(cfg, "fsdp", False)  # False | True | axis name
    if fsdp:
        # shard BEFORE restore: resume then restores each process's own
        # shards directly (see trainer_seg)
        state = shard_state(mesh, state, fsdp=fsdp)
    if resume:
        latest = ckpt.latest_step()
        if latest is not None:
            state = ckpt.restore(latest, target=state)
            logger.log(f"resumed from epoch checkpoint {latest}")

    def _save_tree(st: TrainState) -> dict:
        # fsdp: sharded jax.Arrays straight to orbax (each process writes
        # its own shards); replicated runs keep host numpy copies
        if fsdp:
            return {"step": st.step, "params": st.params,
                    "opt_state": st.opt_state,
                    "batch_stats": st.batch_stats}
        return {"step": np.asarray(st.step),
                "params": jax.device_get(st.params),
                "opt_state": jax.device_get(st.opt_state),
                "batch_stats": jax.device_get(st.batch_stats)}

    def _host_variables(st: TrainState) -> dict:
        # whole host arrays for best/backbone exports, fsdp-safe: params
        # AND batch_stats gathered together (a device_get of a
        # cross-process-sharded batch_stats leaf is not addressable)
        tree = {"params": st.params}
        if st.batch_stats:
            tree["batch_stats"] = st.batch_stats
        from ..parallel.mesh import gather_tree

        return gather_tree(mesh, tree) if fsdp else jax.device_get(tree)

    step_fn = make_train_step(
        model, mesh, task="cls",
        num_classes=cfg.model.num_classes,
        compute_dtype=compute_dtype,
        mixup=mixup,
        fsdp=fsdp, state=state,
    )
    eval_fn = make_cls_metric_step(model, mesh, compute_dtype=compute_dtype)
    rng = jax.random.PRNGKey(cfg.seed + 1)

    best_acc = -1.0
    history = {"train_loss": [], "val_acc1": [], "val_acc5": []}
    start_epoch = int(state.step) // spe
    guard = PreemptionGuard()
    preempted = False
    for epoch in range(start_epoch, n_epochs):
        # fresh loader per epoch; `epoch=` keys both the shuffle order
        # and the dataset's per-item aug RNG stream (fully reproducible
        # runs, fresh augs per epoch)
        loader = DataLoader(
            train_ds, local_bs, shuffle=True, drop_last=True,
            num_threads=cfg.data.num_workers, seed=cfg.seed,
            shard_info=shard, epoch=epoch,
        )
        t0, seen = time.time(), 0
        for bi, batch in enumerate(
            device_prefetch(iter(loader), lambda b: shard_batch(mesh, b))
        ):
            if steps_per_epoch and bi >= steps_per_epoch:
                break
            state, metrics = step_fn(state, batch, rng)
            seen += cfg.data.batch_size
            # graceful preemption: resumable mid-epoch checkpoint at a
            # step all processes agree on (resume restarts this epoch
            # from its beginning — int(step) // spe)
            if guard.should_checkpoint(int(state.step)):
                logger.log(
                    f"preemption notice: checkpointing at step "
                    f"{int(state.step)} (epoch {epoch})"
                )
                ckpt.save(
                    epoch + 1,
                    _save_tree(state),
                    metadata={"epoch": epoch, "preempted": True},
                )
                preempted = True
                break
            if (bi + 1) % cfg.log_interval == 0:
                logger.log(
                    f"epoch {epoch} it {bi+1} loss={float(metrics['loss']):.4f} "
                    f"acc={float(metrics['acc1'])*100:.2f} "
                    f"{seen/(time.time()-t0):.1f} img/s"
                )
            if (bi + 1) % stats_interval == 0:
                # per-parameter weight mean/std/L2 + grad/update scalars at
                # the reference's TB cadence (train_backbone.py:73-83,131-135);
                # computed on device — no param-tree gather under fsdp
                stats = weight_stats_on_device(state.params)
                flat = {
                    f"w/{name}/{key}": val
                    for name, s in stats.items()
                    for key, val in s.items()
                }
                logger.scalars(
                    int(state.step),
                    loss=float(metrics["loss"]),
                    grad_norm=float(metrics["grad_norm"]),
                    update_ratio=float(metrics["update_ratio"]),
                    **flat,
                )
        if preempted:
            break
        history["train_loss"].append(float(metrics["loss"]))

        # ---- validation (top-1/5; train_backbone.py:145-170) -----------
        # Every val image counts: the tail batch is padded up to the
        # static batch size and masked via ``valid``. Counters are
        # computed INSIDE the jitted step with a replicated output, so
        # multi-host runs never fetch a cross-process sharded array and
        # every process already holds the GLOBAL sums (the DataLoader
        # pads shards to equal length, so all processes run the same
        # number of eval_fn calls — no unmatched collectives).
        val_loader = DataLoader(
            val_ds, local_bs, drop_last=False, shard_info=shard,
        )
        hits1 = hits5 = total = 0
        for batch in val_loader:
            n = int(batch["label"].shape[0])
            valid = np.arange(local_bs) < n
            if n < local_bs:
                pad = local_bs - n
                batch = {
                    "image": np.concatenate(
                        [batch["image"],
                         np.zeros((pad, *batch["image"].shape[1:]),
                                  batch["image"].dtype)]
                    ),
                    "label": np.concatenate(
                        [batch["label"],
                         np.zeros((pad,), batch["label"].dtype)]
                    ),
                }
            sb = shard_batch(
                mesh,
                {"image": batch["image"],
                 "label": batch["label"].astype(np.int32),
                 "valid": valid},
            )
            counts = np.asarray(jax.device_get(eval_fn(
                state.params, state.batch_stats,
                sb["image"], sb["label"], sb["valid"],
            )))
            hits1 += int(counts[0])
            hits5 += int(counts[1])
            total += int(counts[2])
        acc1 = hits1 / max(total, 1)
        acc5 = hits5 / max(total, 1)
        history["val_acc1"].append(acc1)
        history["val_acc5"].append(acc5)
        logger.log(f"epoch {epoch} val acc1={acc1*100:.2f} acc5={acc5*100:.2f}")
        # TB scalars per epoch (reference train_backbone.py:291-296)
        logger.scalars(int(state.step), val_acc1=acc1, val_acc5=acc5)

        # ckpt.save must run on EVERY process (orbax barriers across all
        # hosts; see CheckpointManager) — only primary writes, matching
        # the reference's rank-0 saves (train_backbone.py:303-331).
        if (epoch + 1) % 10 == 0 or epoch == n_epochs - 1:
            ckpt.save(
                epoch + 1,
                _save_tree(state),
                metadata={"epoch": epoch, "acc1": acc1},
            )
        if acc1 > best_acc:
            # acc1 is globally reduced — identical on every process, so
            # all ranks enter the save together (orbax barriers).
            best_acc = acc1
            # best + backbone exports are whole host arrays even under
            # fsdp (gathered once) — loadable without the training mesh
            variables = _host_variables(state)
            ckpt.save(
                "best",
                {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})},
                metadata={"epoch": epoch, "acc1": acc1},
            )
            save_backbone_only(
                str(work_dir / "backbone_best"), variables["params"],
            )
    guard.close()
    logger.close()
    return state, history
