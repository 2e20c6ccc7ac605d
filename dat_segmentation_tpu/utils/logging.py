"""Logging / observability: timestamped file+stdout metric logger and
per-parameter weight/grad statistics.

Reference equivalents: rank-0 stdout prints + timestamped mmseg file logs
(new_train.py:218-226, tools/train.py:167-188) and TensorBoard
per-parameter weight mean/std/L2 + grad-update-ratio scalars
(train_backbone.py:73-83,131-135). Scalars go to a JSONL file readable by
any dashboard; no TB dependency.
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

    def __init__(self, path: Optional[str] = None, *, quiet: bool = False):
        self.path = Path(path) if path else None
        self.quiet = quiet
        if self.path:
            self.path.parent.mkdir(parents=True, exist_ok=True)
            self.scalars_path = self.path.with_suffix(".scalars.jsonl")
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
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in values.items()})
        with self.scalars_path.open("a") as f:
            f.write(json.dumps(rec) + "\n")


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
