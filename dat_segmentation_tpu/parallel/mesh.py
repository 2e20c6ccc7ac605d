"""Device mesh construction and sharding helpers.

The scale-out design (replacing the reference's NCCL DDP + torchrun stack,
new_train.py:83,116 and tools/dist_train.sh): a ``jax.sharding.Mesh`` with
a ``data`` axis (optionally ``model`` for wide variants), params replicated,
batches sharded on ``data``. Gradient all-reduce is compiled into the XLA
program over ICI; nothing explicit to tune. Multi-host: call
``jax.distributed.initialize()`` once per host before ``make_mesh``.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Dict[str, int]] = None, devices=None
) -> Mesh:
    """Build a mesh; axis size -1 means 'all remaining devices'.

    Defaults to a 1-D data mesh over every visible device (single chip
    included — a trivial mesh keeps one code path for 1..N chips).
    """
    devices = list(devices if devices is not None else jax.devices())
    shape = dict(shape or {"data": -1})
    known = int(np.prod([v for v in shape.values() if v > 0])) or 1
    for k, v in shape.items():
        if v == -1:
            shape[k] = len(devices) // known
    total = int(np.prod(list(shape.values())))
    assert total <= len(devices), (shape, len(devices))
    arr = np.array(devices[:total]).reshape(list(shape.values()))
    return Mesh(arr, tuple(shape.keys()))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-dim (batch) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch with the batch dim sharded on 'data'.

    Single-process: a plain sharded ``device_put``. Multi-host (a mesh
    spanning processes, built after ``jax.distributed.initialize``): each
    process passes its PROCESS-LOCAL slice of the global batch (its
    DataLoader must be built with ``shard_info=(process_index,
    process_count)``) and the global array is assembled with
    ``jax.make_array_from_process_local_data`` — the reference reaches the
    same state via DistributedSampler + per-rank CUDA tensors
    (new_train.py:121,197).
    """
    s = batch_sharding(mesh)
    n = mesh.shape["data"]
    multihost = any(
        d.process_index != jax.process_index() for d in mesh.devices.flat
    )

    def put(x):
        if multihost:
            return jax.make_array_from_process_local_data(s, np.asarray(x))
        assert x.shape[0] % n == 0, (
            f"batch dim {x.shape[0]} not divisible by data axis {n}"
        )
        return jax.device_put(x, s)

    return jax.tree.map(put, batch)


def process_shard_info() -> tuple:
    """(process_index, process_count) for DataLoader shard_info — each
    host loads a disjoint 1/process_count slice of every global batch."""
    return jax.process_index(), jax.process_count()


def local_batch_size(global_batch_size: int) -> int:
    """Per-process batch size given the configured GLOBAL batch size."""
    n = jax.process_count()
    assert global_batch_size % n == 0, (global_batch_size, n)
    return global_batch_size // n
