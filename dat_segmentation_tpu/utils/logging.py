"""Logging / observability: timestamped file+stdout metric logger and
per-parameter weight/grad statistics.

Reference equivalents: rank-0 stdout prints + timestamped mmseg file logs
(new_train.py:218-226, tools/train.py:167-188) and TensorBoard
per-parameter weight mean/std/L2 + grad-update-ratio scalars
(train_backbone.py:73-83,131-135). Scalars go to a JSONL file readable by
any dashboard AND to TensorBoard event files (pure-python writer,
utils/tensorboard.py — `tensorboard --logdir <work_dir>/tb`), matching
the reference's SummaryWriter output without a TB dependency.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Optional

import jax
import numpy as np


def is_main_process() -> bool:
    return jax.process_index() == 0


class MetricLogger:
    """Timestamped log lines to stdout + file, scalar JSONL sidecar."""

    def __init__(self, path: Optional[str] = None, *, quiet: bool = False,
                 tensorboard: bool = True):
        self.path = Path(path) if path else None
        self.quiet = quiet
        self._tb = None
        if self.path:
            self.path.parent.mkdir(parents=True, exist_ok=True)
            self.scalars_path = self.path.with_suffix(".scalars.jsonl")
            if tensorboard and is_main_process():
                from .tensorboard import SummaryWriter

                self._tb = SummaryWriter(self.path.parent / "tb")
        else:
            self.scalars_path = None

    def log(self, msg: str):
        if not is_main_process():
            return
        line = f"{time.strftime('%Y-%m-%d %H:%M:%S')} {msg}"
        if not self.quiet:
            print(line, flush=True)
        if self.path:
            with self.path.open("a") as f:
                f.write(line + "\n")

    def scalars(self, step: int, **values):
        if not is_main_process() or not self.scalars_path:
            return
        vals = {k: float(v) for k, v in values.items()}
        rec = {"step": step, "time": time.time()}
        rec.update(vals)
        with self.scalars_path.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            self._tb.add_scalars_dict(vals, step)

    def close(self):
        if self._tb is not None:
            self._tb.close()
            self._tb = None


def weight_stats(params, prefix: str = "") -> dict:
    """Per-parameter mean/std/L2 (reference train_backbone.py:73-83)."""
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = prefix + "/".join(str(getattr(p, "key", p)) for p in path)
        arr = np.asarray(leaf)
        out[name] = {
            "mean": float(arr.mean()),
            "std": float(arr.std()),
            "l2": float(np.linalg.norm(arr)),
        }
    return out


def _stats_impl(leaves):
    import jax.numpy as jnp

    out = []
    for x in leaves:
        x = x.astype(jnp.float32)
        out.append(jnp.stack([jnp.mean(x), jnp.std(x),
                              jnp.sqrt(jnp.sum(x * x))]))
    return jnp.stack(out)


_stats_jit = jax.jit(_stats_impl)


def weight_stats_on_device(params, prefix: str = "") -> dict:
    """Same stats as :func:`weight_stats`, computed inside ONE jitted
    program: under fsdp/GSPMD the reductions run over the sharded leaves
    and only a (num_params, 3) scalar table crosses to the host —
    no per-interval all-gather of the full parameter tree (round-4
    advisor finding on trainer_cls stats_interval logging)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = [
        prefix + "/".join(str(getattr(p, "key", p)) for p in path)
        for path, _ in flat
    ]
    table = np.asarray(jax.device_get(_stats_jit([leaf for _, leaf in flat])))
    return {
        n: {"mean": float(r[0]), "std": float(r[1]), "l2": float(r[2])}
        for n, r in zip(names, table)
    }


def grad_update_ratio(params, updates) -> float:
    """||update|| / ||param|| global ratio (train_backbone.py:131-135)."""
    pn = float(
        np.sqrt(
            sum(float(np.vdot(x, x)) for x in jax.tree_util.tree_leaves(params))
        )
    )
    un = float(
        np.sqrt(
            sum(float(np.vdot(x, x)) for x in jax.tree_util.tree_leaves(updates))
        )
    )
    return un / max(pn, 1e-12)
