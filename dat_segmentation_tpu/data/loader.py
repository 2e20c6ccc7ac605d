"""Host-side data loading: threaded prefetch + device transfer overlap.

Replaces the reference's torch DataLoader (workers=32, pin_memory;
new_train.py:119-140). A thread pool decodes/augments ahead of the
training loop and a device-prefetch iterator keeps one batch in flight to
the TPU, so host aug overlaps with device steps — the JAX equivalent of
pinned-memory async H2D.
"""

from __future__ import annotations

import itertools
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np


class DataLoader:
    """Batched iterator over a map-style dataset.

    * shuffle with a deterministic per-epoch seed (the DistributedSampler
      set_epoch semantics, new_train.py:186-191);
    * drop_last for training (static batch shapes for jit);
    * ``shard_info=(rank, world)`` slices the index space per host for
      multi-host input pipelines.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = False,
        drop_last: bool = False,
        num_threads: int = 0,
        seed: int = 0,
        shard_info: Optional[tuple] = None,
        infinite: bool = False,
        epoch: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        if not num_threads:  # auto-size to the host (reference workers=32)
            import os

            num_threads = min(32, os.cpu_count() or 4)
        self.num_threads = num_threads
        self.seed = seed
        self.shard_info = shard_info or (0, 1)
        self.infinite = infinite
        # starting epoch: epoch-per-loader callers (trainer_cls builds a
        # fresh loader every epoch) pass it so the shuffle order AND the
        # dataset's per-item aug stream keep advancing across loaders
        self.epoch0 = epoch
        # Guard against silently frozen aug streams: per-item aug RNG is
        # keyed (seed, epoch, idx), so an epoch-per-loader caller that
        # forgets ``epoch=`` replays bit-identical shuffles AND augs every
        # epoch. Detect the second shuffling construction over the same
        # dataset with the same starting epoch and warn once.
        if shuffle and not infinite:
            key = (id(dataset), seed, epoch)
            if key in DataLoader._shuffle_keys_seen:
                import warnings

                warnings.warn(
                    "DataLoader(shuffle=True) constructed twice over the "
                    f"same dataset with epoch={epoch}: per-item aug RNG is "
                    "keyed (seed, epoch, idx), so this loader repeats the "
                    "previous one bit-for-bit. Pass epoch=<epoch index> "
                    "when building one loader per epoch.",
                    stacklevel=2,
                )
            DataLoader._shuffle_keys_seen.add(key)

    _shuffle_keys_seen: set = set()

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            idx = np.random.RandomState(self.seed + epoch).permutation(n)
        rank, world = self.shard_info
        if world > 1:
            # pad to a multiple of world like DistributedSampler
            pad = (-len(idx)) % world
            if pad:
                idx = np.concatenate([idx, idx[:pad]])
            idx = idx[rank::world]
        return idx

    def __len__(self):
        n = len(self._epoch_indices(0))
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        epochs = itertools.count(self.epoch0) if self.infinite else [self.epoch0]
        with ThreadPoolExecutor(self.num_threads) as pool:
            for epoch in epochs:
                # thread the epoch into the dataset's per-item aug RNG
                # stream (keyed (seed, epoch, idx) -> fully reproducible
                # runs, fresh augs per epoch). Safe w.r.t. the 2-batch
                # pipeline: every previous-epoch future is consumed
                # before this line runs.
                set_epoch = getattr(self.dataset, "set_epoch", None)
                if set_epoch is not None:
                    set_epoch(epoch)
                idx = self._epoch_indices(epoch)
                usable = (
                    len(idx) - len(idx) % self.batch_size
                    if self.drop_last
                    else len(idx)
                )
                batches = [
                    idx[i : i + self.batch_size]
                    for i in range(0, usable, self.batch_size)
                ]
                # pipeline two batches ahead
                futures = [
                    [pool.submit(self.dataset.__getitem__, int(j)) for j in b]
                    for b in batches[:2]
                ]
                for bi, b in enumerate(batches):
                    if bi + 2 < len(batches):
                        futures.append(
                            [
                                pool.submit(self.dataset.__getitem__, int(j))
                                for j in batches[bi + 2]
                            ]
                        )
                    items = [f.result() for f in futures[bi]]
                    yield _collate(items)


def _collate(items):
    out = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], (np.ndarray, np.generic)):
            out[key] = np.stack(vals)
        else:
            out[key] = vals
    return out


def device_prefetch(iterator, put_fn, depth: int = 2):
    """Keep ``depth`` device batches in flight (async H2D overlap).

    put_fn: host batch -> device batch (e.g. parallel.mesh.shard_batch).
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()

    def producer():
        try:
            for batch in iterator:
                q.put(put_fn(batch))
            q.put(sentinel)
        except BaseException as e:  # propagate into the consumer
            q.put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
