"""Metrics: streaming mIoU (psum-reducible) and top-k accuracy.

Reference: per-class intersection/union bincounts with ignore-index
masking accumulated across iterations (new_train.py:276-309) and
mixup-aware top-k accuracy (train_backbone.py:38-71). All counters are
plain arrays, so under pjit they reduce with jax.lax.psum / jnp sums and
gather across hosts for distributed eval (the reference needed explicit
NCCL all_reduce / result collection, tools/test.py:290-298).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


def _hist_compare(x, num_classes: int):
    """Compare-and-sum histogram: (N,1)==(1,C) fused into the reduce."""
    classes = jnp.arange(num_classes, dtype=x.dtype)
    return jnp.sum(
        (x.reshape(-1, 1) == classes[None, :]).astype(jnp.int32), axis=0
    )


def _hist_matmul(x, num_classes: int, chunk: int = 1 << 18):
    """Histogram with the REDUCTION on the MXU: per chunk, build the
    (chunk, C) one-hot compare in bf16 and contract it against a ones
    row — counts accumulate exactly in the f32 accumulator (chunk
    <= 2^18 << 2^24). The VPU compare work is identical to
    :func:`_hist_compare`; only the N-deep add tree moves to the MXU."""
    x = x.reshape(-1)
    n = x.shape[0]
    chunk = min(chunk, n)
    pad = (-n) % chunk
    if pad:
        # parked beyond every class bin -> all-zero one-hot rows
        x = jnp.pad(x, (0, pad), constant_values=num_classes)
    xc = x.reshape(-1, chunk)
    classes = jnp.arange(num_classes, dtype=x.dtype)
    ones = jnp.ones((1, chunk), jnp.bfloat16)

    def body(acc, row):
        oh = (row[:, None] == classes[None, :]).astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            ones, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[0]
        return acc + part, None

    acc, _ = jax.lax.scan(body, jnp.zeros((num_classes,), jnp.float32), xc)
    return acc.astype(jnp.int32)


_HISTS = {"compare": _hist_compare, "matmul": _hist_matmul}


def intersect_and_union(
    pred: jax.Array,
    label: jax.Array,
    num_classes: int,
    *,
    ignore_index: int = 255,
    valid_mask: jax.Array | None = None,
    impl: str = "compare",
):
    """Per-class (intersection, union, pred_area, label_area) counts.

    pred/label: int arrays of identical shape. Returns four (num_classes,)
    int32 arrays; sums of these across any sharding/TTA/batch dims are
    exact, so accumulate then reduce.

    ``impl`` selects the histogram lowering. NOT jnp.bincount in either
    case: bincount lowers to a scatter-add, which TPU serializes —
    40.0 ms at (4, 512, 512)x150 (v5e, 2026-08-17). 'compare' fuses a
    (N, C) equality into a VPU reduce (14.6 ms at the same shape);
    'matmul' keeps the same compares but reduces on the MXU via a
    ones-row contraction (tools/bench_metrics.py measures both at
    train-step level).
    """
    valid = label != ignore_index
    if valid_mask is not None:
        valid = valid & valid_mask
    pred = jnp.where(valid, pred, num_classes)  # park invalid in extra bin
    label = jnp.where(valid, label, num_classes)
    match = jnp.where(pred == label, pred, num_classes)

    hist = _HISTS[impl]
    inter = hist(match, num_classes)
    area_pred = hist(pred, num_classes)
    area_label = hist(label, num_classes)
    union = area_pred + area_label - inter
    return inter, union, area_pred, area_label


def intersect_and_union_np(
    pred: np.ndarray,
    label: np.ndarray,
    num_classes: int,
    *,
    ignore_index: int = 255,
    valid_mask: np.ndarray | None = None,
):
    """numpy twin of :func:`intersect_and_union` for host arrays.

    Eval loops feed host predictions/GT one image at a time; dispatching a
    tiny device program per image costs more in transfer/dispatch overhead
    than the bincount itself (especially through a remote-device tunnel),
    so the host path stays in numpy end to end.
    """
    pred = np.asarray(pred).reshape(-1)
    label = np.asarray(label).reshape(-1)
    valid = label != ignore_index
    if valid_mask is not None:
        valid = valid & np.asarray(valid_mask).reshape(-1)
    pred = np.where(valid, pred, num_classes)
    label = np.where(valid, label, num_classes)
    match = np.where(pred == label, pred, num_classes)

    def hist(x):
        return np.bincount(x, minlength=num_classes + 1)[:num_classes]

    inter = hist(match)
    area_pred = hist(pred)
    area_label = hist(label)
    union = area_pred + area_label - inter
    return inter, union, area_pred, area_label


def miou_from_totals(inter, union, *, eps: float = 1e-10):
    """Mean IoU over classes that appear (union > 0), like mmseg nanmean."""
    inter = np.asarray(inter, np.float64)
    union = np.asarray(union, np.float64)
    present = union > 0
    iou = np.where(present, inter / np.maximum(union, eps), np.nan)
    return float(np.nanmean(iou)), iou


@dataclass
class StreamingIoU:
    """Host-side accumulator for streaming train/val mIoU
    (reference new_train.py:276-309)."""

    num_classes: int
    ignore_index: int = 255

    def __post_init__(self):
        self.reset()

    def reset(self):
        self.inter = np.zeros(self.num_classes, np.int64)
        self.union = np.zeros(self.num_classes, np.int64)
        self.area_label = np.zeros(self.num_classes, np.int64)

    def update(self, pred, label, valid_mask=None):
        # Host arrays take the pure-numpy path: zero device dispatches per
        # eval image (per-image device programs are dominated by dispatch
        # + transfer overhead). Device arrays keep the jnp path so counts
        # accumulated inside jit stay on device.
        if isinstance(pred, jax.Array) or isinstance(label, jax.Array):
            i, u, _, al = intersect_and_union(
                jnp.asarray(pred),
                jnp.asarray(label),
                self.num_classes,
                ignore_index=self.ignore_index,
                valid_mask=(
                    None if valid_mask is None else jnp.asarray(valid_mask)
                ),
            )
        else:
            i, u, _, al = intersect_and_union_np(
                pred, label, self.num_classes,
                ignore_index=self.ignore_index, valid_mask=valid_mask,
            )
        self.inter += np.asarray(i, np.int64)
        self.union += np.asarray(u, np.int64)
        self.area_label += np.asarray(al, np.int64)

    def miou(self) -> float:
        return miou_from_totals(self.inter, self.union)[0]

    def accuracy(self) -> float:
        total = self.area_label.sum()
        return float(self.inter.sum() / max(total, 1))


def topk_accuracy(logits, labels, ks=(1, 5)):
    """Top-k accuracy; labels may be soft (mixup) -> argmax first
    (reference train_backbone.py:38-71)."""
    if labels.ndim == logits.ndim:
        labels = jnp.argmax(labels, axis=-1)
    order = jnp.argsort(logits, axis=-1)[..., ::-1]
    out = {}
    for k in ks:
        hit = (order[..., :k] == labels[..., None]).any(axis=-1)
        out[k] = jnp.mean(hit.astype(jnp.float32))
    return out
