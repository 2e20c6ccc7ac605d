"""Device mesh construction and sharding helpers.

The scale-out design (replacing the reference's NCCL DDP + torchrun stack,
new_train.py:83,116 and tools/dist_train.sh): a ``jax.sharding.Mesh`` with
a ``data`` axis (optionally ``model`` for wide variants), params replicated
(or ZeRO-sharded over ``data`` — see :func:`fsdp_sharding`), batches
sharded on ``data``. Gradient all-reduce is compiled into the XLA
program over ICI; nothing explicit to tune. Multi-host: call
``jax.distributed.initialize()`` once per host before ``make_mesh``.

Spatial partitioning (SP): give the mesh a ``spatial`` axis
(``mesh_shape={"data": -1, "spatial": 2}``) and NHWC images/labels are
additionally sharded along H. GSPMD inserts the halo exchanges for every
spatial conv and the cross-shard reductions for LN/BN/softmax/resize
automatically — the per-chip activation footprint drops by the spatial
factor, which is what unlocks high-resolution crops (896²+) and
effective per-chip batch < 1 without any model changes. This is the
conv-model analog of sequence parallelism; it rides ICI like the data
axis.
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


def shard_hint(x, *spec):
    """``with_sharding_constraint`` that no-ops outside a mesh context.

    Model code calls this to pin layouts at reshape boundaries where
    GSPMD's sharding propagation is known to pick pathological targets
    (the dp x sp "involuntary full rematerialization" at the deformable
    attention's (B*g, ...) <-> (B, g, ...) folds). Each ``spec`` entry is
    an axis name, a tuple of axis names, or None; axes absent from the
    ambient abstract mesh — plain jit tracing, eager tests — or of size
    1 are dropped, and if nothing remains the call is a no-op, so the
    hints are inert everywhere except under a real sharded step (the
    step builders install the mesh via ``use_abstract_mesh``).
    """
    m = jax.sharding.get_abstract_mesh()
    names = set(m.axis_names)
    if not names:
        return x

    def keep(e):
        t = e if isinstance(e, tuple) else (e,)
        t = tuple(a for a in t if a is not None and a in names
                  and m.shape[a] > 1)
        return t if len(t) > 1 else (t[0] if t else None)

    cleaned = tuple(keep(e) for e in spec)
    if all(e is None for e in cleaned):
        return x
    return jax.lax.with_sharding_constraint(x, P(*cleaned))


def spatial_size(mesh: Mesh) -> int:
    """Size of the optional 'spatial' (height-sharding) axis."""
    return mesh.shape.get("spatial", 1)


def array_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Sharding for a batch leaf: batch dim on 'data'; NHW[C] arrays
    (ndim >= 3) additionally shard H on 'spatial' when the mesh has one
    (GSPMD halo-exchanges convs across the H shards)."""
    if ndim >= 3 and spatial_size(mesh) > 1:
        return NamedSharding(mesh, P("data", "spatial"))
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch: batch dim sharded on 'data', and — when the
    mesh has a 'spatial' axis — H of NHW[C] leaves sharded on it.

    Single-process: a plain sharded ``device_put``. Multi-host (a mesh
    spanning processes, built after ``jax.distributed.initialize``): each
    process passes its PROCESS-LOCAL slice of the global batch (its
    DataLoader must be built with ``shard_info=(process_index,
    process_count)``) and the global array is assembled with
    ``jax.make_array_from_process_local_data`` — the reference reaches the
    same state via DistributedSampler + per-rank CUDA tensors
    (new_train.py:121,197). Multi-host SP requires the spatial axis to
    map onto devices within each process (each process holds full-H
    local slices).
    """
    n = mesh.shape["data"]
    sp = spatial_size(mesh)
    multihost = any(
        d.process_index != jax.process_index() for d in mesh.devices.flat
    )

    def put(x):
        s = array_sharding(mesh, np.ndim(x))
        if multihost:
            return jax.make_array_from_process_local_data(s, np.asarray(x))
        assert x.shape[0] % n == 0, (
            f"batch dim {x.shape[0]} not divisible by data axis {n}"
        )
        if np.ndim(x) >= 3 and sp > 1:
            assert x.shape[1] % sp == 0, (
                f"H={x.shape[1]} not divisible by spatial axis {sp}"
            )
        return jax.device_put(x, s)

    return jax.tree.map(put, batch)


def fsdp_sharding(
    mesh: Mesh, x, axis: str = "data", min_size: int = 2 ** 14
) -> NamedSharding:
    """ZeRO-style sharding for one param/optimizer leaf.

    Shards the LARGEST dim divisible by the axis size over ``axis``;
    leaves smaller than ``min_size`` elements (LN scales, biases, BN
    stats, scalars) or with no divisible dim stay replicated — sharding
    them would cost more in collective latency than the bytes saved.

    With params+opt state sharded over ``data`` and the batch sharded
    over the same axis, GSPMD compiles exactly the ZeRO-2/3 schedule:
    all-gather each weight right before its use in fwd/bwd, reduce-
    scatter gradients into the shard owners, update only the local
    shard of mu/nu/params. Per-chip optimizer memory drops by the axis
    size — the enabler for DAT-B++-scale training at large per-chip
    batch (reference has no analog; its DDP replicates optimizer state,
    new_train.py:214-216).
    """
    n = mesh.shape.get(axis, 1)
    shape = tuple(getattr(x, "shape", ()))
    if n <= 1 or int(np.prod(shape, dtype=np.int64)) < min_size:
        return NamedSharding(mesh, P())
    cands = [(d, i) for i, d in enumerate(shape) if d % n == 0]
    if not cands:
        return NamedSharding(mesh, P())
    _, i = max(cands)
    spec = [None] * len(shape)
    spec[i] = axis
    return NamedSharding(mesh, P(*spec))


def state_shardings(mesh: Mesh, state, *, fsdp: bool = False, axis: str = "data"):
    """Tree of shardings matching a TrainState (same pytree structure).

    fsdp=False: everything replicated (the DDP-equivalent default).
    fsdp=True: params and optimizer-state leaves sharded per
    :func:`fsdp_sharding`; the shape-based rule automatically covers
    AdamW's mu/nu (param-shaped) while keeping scalars/BN stats
    replicated.
    """
    repl = NamedSharding(mesh, P())
    if not fsdp:
        return jax.tree.map(lambda _: repl, state)
    _check_fsdp_axis(mesh, axis)
    return jax.tree.map(lambda x: fsdp_sharding(mesh, x, axis=axis), state)


def _check_fsdp_axis(mesh: Mesh, axis: str) -> None:
    """fsdp with a missing/size-1 axis would silently degrade to plain DP
    (full per-chip optimizer memory) — fail loudly instead."""
    if axis not in mesh.axis_names:
        raise ValueError(
            f"fsdp axis {axis!r} is not a mesh axis (mesh has "
            f"{tuple(mesh.axis_names)}); refusing to silently replicate"
        )
    if mesh.shape[axis] <= 1:
        raise ValueError(
            f"fsdp axis {axis!r} has size {mesh.shape[axis]}; sharding "
            "over it is a no-op — drop fsdp or grow the axis"
        )


def shard_state(mesh: Mesh, state, *, fsdp=False, axis: str = "data"):
    """Place a TrainState on the mesh (replicated, or ZeRO-sharded).

    Call once before the train loop; the jitted step's in/out shardings
    then keep every leaf in place. Checkpointing a cross-process-sharded
    state works two ways: pass the sharded ``jax.Array`` leaves straight
    to orbax (each process writes its own shards — what the trainers do),
    or materialize a host copy with :func:`gather_tree`.
    """
    if isinstance(fsdp, str):
        fsdp, axis = True, fsdp
    shardings = state_shardings(mesh, state, fsdp=fsdp, axis=axis)
    return jax.tree.map(jax.device_put, state, shardings)


def gather_tree(mesh: Mesh, tree):
    """Materialize a (possibly fsdp/cross-process-sharded) tree as host
    numpy, identical on every process.

    A plain ``jax.device_get`` of a cross-process-sharded leaf fails (the
    remote shards aren't addressable); resharding to fully-replicated
    inside a jitted identity makes XLA all-gather the shards over ICI,
    after which every process holds the whole array locally.
    """
    repl = NamedSharding(mesh, P())
    shardings = jax.tree.map(lambda _: repl, tree)
    gathered = jax.jit(lambda t: t, out_shardings=shardings)(tree)
    return jax.device_get(gathered)


def process_shard_info() -> tuple:
    """(process_index, process_count) for DataLoader shard_info — each
    host loads a disjoint 1/process_count slice of every global batch."""
    return jax.process_index(), jax.process_count()


def local_batch_size(global_batch_size: int) -> int:
    """Per-process batch size given the configured GLOBAL batch size."""
    n = jax.process_count()
    assert global_batch_size % n == 0, (global_batch_size, n)
    return global_batch_size // n
