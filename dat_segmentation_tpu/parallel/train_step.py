"""pjit-sharded train/eval steps.

One compiled XLA program per step: forward (bf16 compute, fp32 params),
loss, backward, AdamW update — with gradient reduction over the mesh's
``data`` axis inserted by GSPMD. This replaces the reference's
DDP-wrapped loop (new_train.py:183-216): no process groups, no bucketed
all-reduce, no loss-scaling (bf16 needs none, unlike the fp16
Fp16OptimizerHook at configs/dat/upn_tiny_160k_dp03_lr6.py:56-63).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import state_shardings
from ..train.losses import (
    label_smoothing_cross_entropy,
    segmentation_loss,
    soft_target_cross_entropy,
)
from ..train.metrics import intersect_and_union


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    batch_stats: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        new_state, _ = self.apply_gradients_with_updates(grads, new_batch_stats)
        return new_state

    def apply_gradients_with_updates(self, grads, new_batch_stats=None):
        """Like apply_gradients but also returns the optimizer updates
        (for update/param-norm observability, reference
        train_backbone.py:131-135)."""
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_state = self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
        )
        return new_state, updates


def create_train_state(
    model, tx: optax.GradientTransformation, rng, sample_input
) -> TrainState:
    # jitted init: one XLA program instead of ~1000 eager per-op
    # dispatches — through the remote device tunnel the eager form costs
    # minutes of wall clock per trainer/bench start-up
    init = jax.jit(lambda k, x: model.init({"params": k}, x, train=False))
    variables = init(rng, sample_input)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )


def _cast(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def make_train_step(
    model,
    mesh: Mesh,
    *,
    task: str = "seg",
    aux_weight: float = 0.4,
    ignore_index: int = 255,
    num_classes: int = 150,
    compute_dtype=jnp.bfloat16,
    label_smoothing: float = 0.1,
    mixup: bool = False,
    fsdp: "bool | str" = False,
    state: "TrainState | None" = None,
    # in-step IoU counter lowering: 'compare' | 'matmul'
    # (train/metrics.py), or 'none' to drop the counters from the step
    # entirely (metrics then has no inter/union keys — perf probes only;
    # the trainers need them for streaming train-mIoU, new_train.py:215)
    iou_impl: str = "compare",
) -> Callable:
    """Build the jitted sharded train step.

    batch: {'image': (B,H,W,3) f32, 'label': (B,H,W) i32 (seg) or
    (B,)/(B,num_classes) (cls)}. Returns (state, metrics dict).

    fsdp=True shards params + optimizer state over the 'data' axis
    (ZeRO; see parallel/mesh.py:fsdp_sharding); an axis NAME instead
    shards them over that axis — 'model' on a {'data': X, 'model': Y}
    mesh is tensor parallelism (GSPMD partitions each matmul over the
    weight shards and all-reduces partials over 'model'). Either way,
    pass the concrete ``state`` so the per-leaf sharding tree can be
    built, and place it with ``shard_state`` before the loop.
    """

    def loss_fn(params, batch_stats, batch, rng):
        rng_drop, rng_mix = jax.random.split(rng)
        image = batch["image"].astype(compute_dtype)
        if task == "cls" and mixup and batch["label"].ndim == 1:
            from ..data.mixup import mixup_cutmix

            image, soft = mixup_cutmix(
                rng_mix, image, batch["label"], num_classes=num_classes,
                label_smoothing=label_smoothing,
            )
            batch = dict(batch, image=image, label=soft)
        variables = {"params": _cast(params, compute_dtype)}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        mutable = ["batch_stats"] if batch_stats else []
        out, updates = model.apply(
            variables,
            image,
            train=True,
            deterministic=False,
            rngs={"dropout": rng_drop},
            mutable=mutable,
        )
        metrics = {}
        if task == "seg":
            logits, aux = out if isinstance(out, tuple) else (out, None)
            loss = segmentation_loss(
                logits,
                aux,
                batch["label"],
                aux_weight=aux_weight,
                ignore_index=ignore_index,
            )
            if iou_impl != "none":
                pred = jnp.argmax(logits, axis=-1)
                inter, union, _, _ = intersect_and_union(
                    pred, batch["label"], num_classes,
                    ignore_index=ignore_index, impl=iou_impl,
                )
                metrics.update(inter=inter, union=union)
        else:
            labels = batch["label"]
            if mixup and labels.ndim == 2:
                loss = soft_target_cross_entropy(out, labels)
                hard = jnp.argmax(labels, axis=-1)
            else:
                loss = label_smoothing_cross_entropy(
                    out, labels, smoothing=label_smoothing
                )
                hard = labels
            acc = jnp.mean((jnp.argmax(out, -1) == hard).astype(jnp.float32))
            metrics["acc1"] = acc
        new_stats = updates.get("batch_stats", batch_stats) if mutable else batch_stats
        return loss, (new_stats, metrics)

    def step_fn(state: TrainState, batch, rng):
        # ambient mesh for in-model shard_hint calls (parallel/mesh.py):
        # the hints pin reshape-boundary layouts GSPMD otherwise
        # repartitions by full rematerialization on dp x sp meshes
        with jax.sharding.use_abstract_mesh(mesh.abstract_mesh):
            return _step(state, batch, rng)

    def _step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, rng)
        grads = _cast(grads, jnp.float32)
        param_norm = optax.global_norm(state.params)
        state, updates = state.apply_gradients_with_updates(grads, new_stats)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        # ||update|| / ||param||: the grad-update-ratio scalar the reference
        # tensorboards (train_backbone.py:131-135), computed on device so
        # logging it costs one scalar fetch, not a tree D2H.
        metrics["update_ratio"] = optax.global_norm(updates) / (
            param_norm + 1e-12
        )
        return state, metrics

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    # spatial axis (see parallel/mesh.py): NHW[C] leaves shard H too —
    # image always; seg labels are (B, H, W), cls labels are (B,)/(B, C)
    spatial = "spatial" in mesh.axis_names and mesh.shape["spatial"] > 1
    img = NamedSharding(mesh, P("data", "spatial")) if spatial else data
    lbl = img if task == "seg" else data
    batch_shardings = {"image": img, "label": lbl}
    if fsdp:
        if state is None:
            raise ValueError("fsdp=True needs the concrete `state` to "
                             "derive per-leaf shardings")
        axis = fsdp if isinstance(fsdp, str) else "data"
        state_sh = state_shardings(mesh, state, fsdp=True, axis=axis)
    else:
        state_sh = repl
    return jax.jit(
        step_fn,
        # state replicated (or ZeRO-sharded), batch sharded per leaf
        in_shardings=(state_sh, batch_shardings, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )


def make_cls_metric_step(model, mesh: Mesh, *, compute_dtype=jnp.bfloat16):
    """Jitted sharded forward + top-1/5 hit counters, replicated output.

    Multi-host safe (unlike fetching sharded logits to the host): the
    whole metric — argmax/top-5 vs labels, masked by ``valid`` for padded
    tail entries — reduces to three scalars inside the XLA program, so
    GSPMD inserts the cross-device reduction and every process receives
    identical GLOBAL [hits1, hits5, total] (reference analog: the NCCL
    metric all_reduce at train_backbone.py:161-164).
    """

    def fwd(params, batch_stats, image, label, valid):
        with jax.sharding.use_abstract_mesh(mesh.abstract_mesh):
            return _fwd(params, batch_stats, image, label, valid)

    def _fwd(params, batch_stats, image, label, valid):
        variables = {"params": _cast(params, compute_dtype)}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        logits = model.apply(
            variables, image.astype(compute_dtype), train=False
        ).astype(jnp.float32)
        k = min(5, logits.shape[-1])
        _, top5 = jax.lax.top_k(logits, k)
        hit1 = (jnp.argmax(logits, -1) == label) & valid
        hit5 = (top5 == label[:, None]).any(-1) & valid
        return jnp.stack([
            hit1.sum().astype(jnp.int32),
            hit5.sum().astype(jnp.int32),
            valid.sum().astype(jnp.int32),
        ])

    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    spatial = "spatial" in mesh.axis_names and mesh.shape["spatial"] > 1
    img = NamedSharding(mesh, P("data", "spatial")) if spatial else data
    return jax.jit(
        fwd, in_shardings=(None, None, img, data, data), out_shardings=repl
    )


def make_eval_step(model, mesh: Mesh, *, compute_dtype=jnp.bfloat16):
    """Jitted sharded forward returning logits (eval/TTA building block)."""

    def fwd(params, batch_stats, image):
        with jax.sharding.use_abstract_mesh(mesh.abstract_mesh):
            out = model.apply(
                {"params": _cast(params, compute_dtype)}
                | ({"batch_stats": batch_stats} if batch_stats else {}),
                image.astype(compute_dtype), train=False,
            )
        return out.astype(jnp.float32) if hasattr(out, "astype") else out

    spatial = "spatial" in mesh.axis_names and mesh.shape["spatial"] > 1
    data = (
        NamedSharding(mesh, P("data", "spatial"))
        if spatial
        else NamedSharding(mesh, P("data"))
    )
    return jax.jit(fwd, in_shardings=(None, None, data))
