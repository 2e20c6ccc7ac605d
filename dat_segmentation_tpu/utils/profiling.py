"""Profiling / tracing utilities.

The reference has no profiler (SURVEY.md §5: only cudnn_benchmark + iter
timers). TPU-native replacements: jax.profiler traces viewable in
XProf/TensorBoard, compiled FLOPs/memory introspection, and simple
throughput timers.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """Capture a device trace: ``with trace('dir'): step()``; open the
    result with xprof / tensorboard-profile."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


def compiled_stats(fn: Callable, *args) -> dict:
    """Lower+compile ``fn`` and report XLA cost/memory analysis."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis() or {}
    mem = compiled.memory_analysis()
    out = {
        "flops": float(cost.get("flops", 0.0)),
        "bytes_accessed": float(cost.get("bytes accessed", 0.0)),
    }
    if mem is not None:
        out.update(
            temp_bytes=int(mem.temp_size_in_bytes),
            argument_bytes=int(mem.argument_size_in_bytes),
            output_bytes=int(mem.output_size_in_bytes),
        )
    return out


class Throughput:
    """images/sec meter with warmup (SURVEY §5: the reference only had
    mmseg's iter-time logging)."""

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self.reset()

    def reset(self):
        self._count = 0
        self._items = 0
        self._t0 = None

    def step(self, n_items: int):
        self._count += 1
        if self._count == self.warmup:
            self._t0 = time.perf_counter()
            self._items = 0
        elif self._count > self.warmup:
            self._items += n_items

    @property
    def rate(self) -> Optional[float]:
        if self._t0 is None or self._items == 0:
            return None
        return self._items / (time.perf_counter() - self._t0)


def _force(tree):
    """device_get a scalar from every leaf — the only reliable sync on
    backends whose ready-events resolve before execution (axon tunnel)."""
    import numpy as np

    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "ndim"):
            np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))


def benchmark(fn: Callable, *args, iters: int = 20, warmup: int = 3) -> float:
    """Wall time per call (seconds), synced via a real device_get (the
    device executes in-order, so fetching the last output waits for all)."""
    for _ in range(warmup):
        _force(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters
