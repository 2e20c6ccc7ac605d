"""Dataset-level evaluation: streaming mIoU over ADE20K val.

The TPU equivalent of ``tools/test.py --eval mIoU [--aug-test]``
(reference: tools/test.py:264-317): per image, TTA-predict at original
resolution against the original-resolution GT, accumulate per-class
intersection/union, report mIoU/aAcc.

Two execution modes:
* ``batch_size=1``: the straightforward per-image loop.
* ``batch_size>1`` (whole-image mode): images are grouped by padded
  bucket shape and run ``batch_size`` per forward — val is latency-bound
  per image otherwise. Numerics are identical (same padded forward,
  per-image slicing).

Multi-host: pass ``shard_info`` so each process evaluates a disjoint
slice, and ``distributed=True`` to psum the intersection/union counters
in-run via jax.experimental.multihost_utils — replacing the reference's
NCCL/tmpdir result collection (tools/test.py:290-298). ``--shard`` +
offline ``merge_shard_results`` remains for fleet-style runs.
"""

from __future__ import annotations

import os
import time
from collections import defaultdict, deque
from concurrent.futures import ThreadPoolExecutor
from typing import Optional, Sequence

import numpy as np

from ..train.metrics import StreamingIoU
from .inference import (
    SegInferencer, _argmax_resized, _np_softmax, _resize_probs, _round_up,
)

MS_RATIOS = (0.5, 0.75, 1.0, 1.25, 1.5, 1.75)  # tools/test.py:143-148


def _reduce_across_processes(iou: StreamingIoU, done: int):
    """Sum IoU counters + image count over all JAX processes
    (no-op single-process)."""
    import jax

    if jax.process_count() <= 1:
        return iou, done
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    counts = np.stack([iou.inter, iou.union, iou.area_label]).astype(np.int64)
    payload = np.concatenate(
        [counts, np.full((3, 1), done, np.int64)], axis=1
    )
    # jnp.asarray would silently truncate int64 -> int32 with x64 disabled;
    # gather the counters as two int32 halves and recombine host-side in
    # int64 (counts can exceed 2^31 pixels on large evals).
    lo = (payload & 0x7FFFFFFF).astype(np.int32)
    hi = (payload >> 31).astype(np.int32)
    g_lo = np.asarray(
        multihost_utils.process_allgather(jnp.asarray(lo))
    ).astype(np.int64)
    g_hi = np.asarray(
        multihost_utils.process_allgather(jnp.asarray(hi))
    ).astype(np.int64)
    totals = ((g_hi << 31) + g_lo).sum(axis=0)
    iou.inter, iou.union, iou.area_label = (
        totals[0, :-1], totals[1, :-1], totals[2, :-1],
    )
    return iou, int(totals[0, -1])


class _BucketBatcher:
    """Groups same-padded-bucket TTA inputs into fixed-size batches.

    Every flush runs one (batch, hb, wb) forward — the batch dim never
    varies, so each distinct bucket shape compiles exactly once. Partial
    buffers are zero-padded up to the batch size at flush_all().
    """

    def __init__(self, inferencer: SegInferencer, batch_size: int, on_logits):
        self.inf = inferencer
        self.batch_size = batch_size
        # (meta, stride-4 logits, mid_hw, crop_hw) -> None: the callback
        # owns the host resize chain (materialized for TTA accumulation,
        # chunked resize+argmax on the single-scale fast path)
        self.on_logits = on_logits
        self.buffers = defaultdict(list)  # (hb, wb) -> [(img, meta)]

    def add(self, img: np.ndarray, meta: dict):
        b = self.inf.bucket
        key = (_round_up(img.shape[0], b), _round_up(img.shape[1], b))
        buf = self.buffers[key]
        buf.append((img, meta))
        if len(buf) >= self.batch_size:
            self._flush(key)

    def _flush(self, key):
        entries = self.buffers.pop(key, [])
        if not entries:
            return
        hb, wb = key
        padded = np.zeros((self.batch_size, hb, wb, 3), np.float32)
        # empty batch slots carry the full padded extent (masking no-ops)
        valid = np.full((self.batch_size, 2), (hb, wb), np.int32)
        for i, (img, _) in enumerate(entries):
            padded[i, : img.shape[0], : img.shape[1]] = img
            valid[i] = img.shape[:2]
        exact = self.inf.exact and any(
            img.shape[:2] != (hb, wb) for img, _ in entries
        )
        small = self.inf.forward_batch(
            padded, valid_hw=valid if exact else None
        )  # (B, hb/s, wb/s, C)
        for i, (img, meta) in enumerate(entries):
            h, w = img.shape[:2]
            if exact:
                # slice the stride-4 logits to the true extent; resize
                # with the TRUE ratio (mmseg resizes the exact run's
                # logits straight to the image shape)
                eh, ew = self.inf._ext4((h, w))
                self.on_logits(meta, small[i][:eh, :ew], (h, w), None)
            else:
                self.on_logits(meta, small[i], (hb, wb), (h, w))

    def flush_all(self):
        for key in list(self.buffers):
            self._flush(key)


def _evaluate_batched(
    inferencer: SegInferencer,
    dataset,
    iou: StreamingIoU,
    *,
    indices,
    img_scale,
    ratios,
    flip: bool,
    keep_ratio: bool,
    batch_size: int,
    log_interval: int,
    verbose: bool,
    on_pred=None,
    postproc_workers: int = 0,
) -> int:
    n_aug = len(ratios) * (2 if flip else 1)
    pending = {}  # idx -> [prob_sum | None, count, gt]
    done = [0]
    t0 = time.time()

    # single-scale postproc pool: the per-image resize+argmax chain is
    # pure host work (cv2 releases the GIL), so with workers it overlaps
    # the NEXT bucket's device forward instead of serializing after it.
    # Workers only compute class maps; all finalization (IoU update,
    # on_pred, pending bookkeeping) stays on this thread via _drain.
    executor = None
    futs: deque = deque()  # (idx, Future[pred])
    if postproc_workers > 0 and n_aug == 1:
        executor = ThreadPoolExecutor(postproc_workers)

    def _drain(block: bool = False, down_to: Optional[int] = None):
        # down_to: blocking-pop only until the queue is back under the
        # in-flight bound — draining to EMPTY there would serialize the
        # whole pipeline every time the bound is hit
        while futs and (
            block or futs[0][1].done()
            or (down_to is not None and len(futs) > down_to)
        ):
            idx, fut = futs.popleft()
            _finalize(idx, fut.result())

    def _finalize(idx, pred):
        iou.update(pred, pending[idx][2])
        if on_pred is not None:
            on_pred(idx, pred)
        del pending[idx]
        done[0] += 1
        if verbose and done[0] % log_interval == 0:
            rate = done[0] / (time.time() - t0)
            print(
                f"[eval] {done[0]} imgs, {rate:.2f} img/s, "
                f"running mIoU={iou.miou()*100:.2f}"
            )

    def on_logits(meta, small, mid_hw, crop_hw):
        idx, do_flip, ori = meta["idx"], meta["flip"], meta["ori"]
        if n_aug == 1:
            # single-scale fast path (no flips to accumulate): chunked
            # resize chain + running argmax — identical predictions
            # (argmax commutes with softmax; see _argmax_resized), no
            # full-resolution softmax / prob plane on the host
            final = None if (crop_hw or mid_hw) == tuple(ori) else ori
            if executor is not None:
                futs.append((idx, executor.submit(
                    _argmax_resized, small, mid_hw,
                    crop_hw=crop_hw, final_hw=final,
                )))
                # bound in-flight logits slabs (~13 MB each at bucket/4)
                _drain(down_to=4 * postproc_workers)
                return
            _finalize(idx, _argmax_resized(
                small, mid_hw, crop_hw=crop_hw, final_hw=final,
            ).astype(np.int32))
            return
        logits = _resize_probs(small, mid_hw)
        if crop_hw is not None:
            logits = logits[: crop_hw[0], : crop_hw[1]]
        if do_flip:
            logits = logits[:, ::-1]
        # mmseg order: whole_inference resizes the LOGITS to ori_shape
        # first, inference() softmaxes after (they don't commute —
        # softmax-then-resize deviates near class boundaries)
        if logits.shape[:2] != tuple(ori):
            logits = _resize_probs(logits, ori)
        probs = _np_softmax(logits)
        acc = pending[idx]
        acc[0] += probs
        acc[1] += 1
        if acc[1] == n_aug:
            pred = np.argmax(acc[0], axis=-1).astype(np.int32)
            _finalize(idx, pred)

    batcher = _BucketBatcher(inferencer, batch_size, on_logits)
    # Each pending image holds a full-res (H, W, C) float32 prob-sum
    # (~200 MB for a 2048x512 ADE image at 150 classes); under TTA an
    # image stays pending until its slowest-filling bucket flushes. Bound
    # host RSS by force-flushing every bucket when too many accumulators
    # are in flight (partial flushes re-run the same padded shapes, so no
    # recompiles — just occasional wasted batch slots).
    max_pending = max(2 * batch_size, 8)
    for idx in indices:
        raw, gt = dataset.load_raw(idx)
        ori = gt.shape
        pending[idx] = [
            # the fast path never touches the accumulator — don't pay
            # the ~200 MB/img allocation for it
            None if n_aug == 1
            else np.zeros((*ori, inferencer.num_classes), np.float32),
            0, gt,
        ]
        for inp, do_flip in inferencer.tta_inputs(
            raw, img_scale=img_scale, ratios=ratios, flip=flip,
            keep_ratio=keep_ratio,
        ):
            batcher.add(inp, {"idx": idx, "flip": do_flip, "ori": ori})
        _drain()  # retire finished postproc before the RSS check
        if len(pending) > max_pending:
            batcher.flush_all()
            _drain(block=True)
    batcher.flush_all()
    _drain(block=True)
    if executor is not None:
        executor.shutdown()
    assert not pending, f"{len(pending)} images never finalized"
    return done[0]


def evaluate_dataset(
    inferencer: SegInferencer,
    dataset,
    *,
    num_classes: int = 150,
    ignore_index: int = 255,
    img_scale=(2048, 512),
    aug_test: bool = False,
    keep_ratio: bool = True,
    max_images: Optional[int] = None,
    shard_info: Optional[tuple] = None,
    batch_size: int = 1,
    distributed: bool = False,
    log_interval: int = 50,
    verbose: bool = True,
    on_pred=None,
    postproc_workers: Optional[int] = None,
) -> dict:
    """Returns {'mIoU': float, 'aAcc': float, 'per_class_iou': list}.

    ``on_pred(idx, pred)`` fires once per image with the finalized
    original-resolution class map — visualization/format writers hook in
    here so --show-dir/--format-dir reuse the eval pass instead of
    re-running inference (the reference paints from collected results,
    tools/test.py:274-283).

    ``postproc_workers``: host threads for the single-scale resize+argmax
    postproc (cv2 releases the GIL), overlapping it with the next
    bucket's device forward. None = auto (cpu_count - 1, max 8; 0 on a
    1-core host). Only the batched single-scale path uses it — TTA
    accumulates probabilities in shared per-image state."""
    if postproc_workers is None:
        postproc_workers = min(max((os.cpu_count() or 1) - 1, 0), 8)
    ratios: Sequence[float] = MS_RATIOS if aug_test else (1.0,)
    flip = bool(aug_test)
    iou = StreamingIoU(num_classes, ignore_index)
    rank, world = shard_info or (0, 1)
    n = len(dataset) if max_images is None else min(max_images, len(dataset))
    indices = range(rank, n, world)
    if batch_size > 1 and inferencer.mode == "whole":
        done = _evaluate_batched(
            inferencer, dataset, iou,
            indices=indices, img_scale=img_scale, ratios=ratios, flip=flip,
            keep_ratio=keep_ratio, batch_size=batch_size,
            log_interval=log_interval, verbose=verbose, on_pred=on_pred,
            postproc_workers=postproc_workers,
        )
    else:
        t0 = time.time()
        done = 0
        for idx in indices:
            raw, gt = dataset.load_raw(idx)
            pred = inferencer.predict(
                raw,
                img_scale=img_scale,
                ratios=ratios,
                flip=flip,
                keep_ratio=keep_ratio,
                ori_shape=gt.shape,
            )
            iou.update(pred, gt)
            if on_pred is not None:
                on_pred(idx, pred)
            done += 1
            if verbose and done % log_interval == 0:
                rate = done / (time.time() - t0)
                print(
                    f"[eval] {done} imgs, {rate:.2f} img/s, "
                    f"running mIoU={iou.miou()*100:.2f}"
                )
    if distributed:
        iou, done = _reduce_across_processes(iou, done)
    miou = iou.miou()
    from ..train.metrics import miou_from_totals

    _, per_class = miou_from_totals(iou.inter, iou.union)
    # per-class Acc = inter / GT area (mmseg's per-class table columns)
    with np.errstate(invalid="ignore", divide="ignore"):
        per_acc = np.where(
            iou.area_label > 0, iou.inter / np.maximum(iou.area_label, 1),
            np.nan,
        )
    result = {
        "mIoU": miou,
        "aAcc": iou.accuracy(),
        "per_class_iou": [None if np.isnan(v) else float(v) for v in per_class],
        "per_class_acc": [None if np.isnan(v) else float(v) for v in per_acc],
        "num_images": done,
        "inter": iou.inter.tolist(),
        "union": iou.union.tolist(),
    }
    return result


def merge_shard_results(results: Sequence[dict], num_classes: int = 150) -> dict:
    """Sum per-shard counters (offline multi-host eval collection)."""
    inter = np.zeros(num_classes, np.int64)
    union = np.zeros(num_classes, np.int64)
    n = 0
    for r in results:
        inter += np.asarray(r["inter"], np.int64)
        union += np.asarray(r["union"], np.int64)
        n += r["num_images"]
    from ..train.metrics import miou_from_totals

    miou, per_class = miou_from_totals(inter, union)
    return {
        "mIoU": miou,
        "per_class_iou": [None if np.isnan(v) else float(v) for v in per_class],
        "num_images": n,
    }
