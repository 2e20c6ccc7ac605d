"""utils: metric logger, weight stats, profiling helpers."""

import json

import numpy as np
import jax.numpy as jnp

from dat_segmentation_tpu.utils.logging import (
    MetricLogger,
    grad_update_ratio,
    weight_stats,
)
from dat_segmentation_tpu.utils.profiling import Throughput, benchmark, compiled_stats


def test_metric_logger_files(tmp_path):
    log = MetricLogger(tmp_path / "t.log", quiet=True)
    log.log("hello world")
    log.scalars(10, loss=1.5, lr=1e-4)
    assert "hello world" in (tmp_path / "t.log").read_text()
    rec = json.loads((tmp_path / "t.scalars.jsonl").read_text().strip())
    assert rec["step"] == 10 and rec["loss"] == 1.5


def test_weight_stats_and_ratio():
    params = {"a": {"w": np.ones((4, 4), np.float32) * 2.0}}
    stats = weight_stats(params)
    key = next(iter(stats))
    assert stats[key]["mean"] == 2.0
    assert stats[key]["l2"] == np.linalg.norm(np.ones(16) * 2)
    updates = {"a": {"w": np.ones((4, 4), np.float32) * 0.2}}
    assert abs(grad_update_ratio(params, updates) - 0.1) < 1e-6


def test_throughput_meter():
    tp = Throughput(warmup=1)
    tp.step(4)
    assert tp.rate is None
    tp.step(4)
    tp.step(4)
    assert tp.rate is not None and tp.rate > 0


def test_benchmark_and_compiled_stats():
    def f(x):
        return x @ x

    x = jnp.ones((64, 64))
    dt = benchmark(f, x, iters=3, warmup=1)
    assert dt > 0
    stats = compiled_stats(f, x)
    assert stats["flops"] > 0
