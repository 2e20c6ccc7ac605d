"""Checkpoint save/restore (Orbax) + torch-checkpoint ingestion.

Covers the reference's three mechanisms (SURVEY.md §5):
* periodic training checkpoints with step/optimizer state and metadata
  (classes/config; reference new_train.py:228-238, tools/train.py:222-233);
* best-checkpoint tracking on val improvement (new_train.py:241-260);
* backbone-only export for downstream fine-tuning
  (train_backbone.py:303-331).

Restore is tolerant like the reference loader (loading.py:10-37): missing/
unexpected keys are reported, torch ``.pth`` files are converted on the
fly via utils/torch_convert.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper with step dirs, best tracking and metadata.

    Multi-process contract: ``save`` must be called by EVERY process
    (orbax's ``Checkpointer.save`` runs ``sync_global_processes``
    barriers across all hosts — a rank-0-only call deadlocks: rank 0
    parks in the barrier AllGather while the other ranks run ahead into
    the next train step's grad psum and time out). Filesystem side
    effects (rmtree, metadata, GC) happen on the primary host only;
    orbax itself writes replicated numpy leaves once.
    """

    def __init__(self, directory: str, *, max_to_keep: int = 3):
        self.directory = Path(directory).absolute()
        if jax.process_index() == 0:
            self.directory.mkdir(parents=True, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()
        self.max_to_keep = max_to_keep

    def _step_dir(self, tag) -> Path:
        return self.directory / f"ckpt_{tag}"

    def save(
        self,
        tag,
        state_tree: Dict[str, Any],
        *,
        metadata: Optional[dict] = None,
        overwrite: bool = True,
    ):
        path = self._step_dir(tag)
        primary = jax.process_index() == 0
        # Primary rmtrees BEFORE entering orbax's save (whose first act is
        # an all-process barrier), so no process can observe a half-deleted
        # directory: everyone passes the barrier only after primary — and
        # its rmtree — has entered.
        if primary and path.exists() and overwrite:
            import shutil

            shutil.rmtree(path)
        self._ckpt.save(path, state_tree)
        self._ckpt.wait_until_finished()
        if primary:
            if metadata is not None:
                (self.directory / f"ckpt_{tag}.meta.json").write_text(
                    json.dumps(metadata, default=str)
                )
            self._gc()

    def restore(self, tag, target=None):
        path = self._step_dir(tag)
        return self._ckpt.restore(path, target=target)

    def latest_step(self) -> Optional[int]:
        steps = []
        for p in self.directory.glob("ckpt_*"):
            if p.is_dir():
                try:
                    steps.append(int(p.name.split("_")[1]))
                except ValueError:
                    continue
        return max(steps) if steps else None

    def _gc(self):
        steps = sorted(
            [
                int(p.name.split("_")[1])
                for p in self.directory.glob("ckpt_*")
                if p.is_dir() and p.name.split("_")[1].isdigit()
            ]
        )
        for s in steps[: -self.max_to_keep] if self.max_to_keep else []:
            import shutil

            shutil.rmtree(self._step_dir(s), ignore_errors=True)
            meta = self.directory / f"ckpt_{s}.meta.json"
            if meta.exists():
                meta.unlink()


def save_backbone_only(path: str, params: Dict[str, Any]):
    """Export just the backbone subtree for seg fine-tuning
    (reference train_backbone.py:303-331). Call from EVERY process in
    multi-process runs (orbax barriers internally; see CheckpointManager)."""
    ckpt = ocp.StandardCheckpointer()
    p = Path(path).absolute()
    if jax.process_index() == 0 and p.exists():
        import shutil

        shutil.rmtree(p)
    ckpt.save(p, {"backbone": params["backbone"]})
    ckpt.wait_until_finished()


def load_pretrained(path: str, model_cfg, kind: str = "segmentor"):
    """Load either an orbax dir or a torch .pth (auto-converted).

    Returns a variables dict {'params': ..., maybe 'batch_stats': ...}.
    """
    p = Path(path)
    if p.is_dir():
        return ocp.StandardCheckpointer().restore(p.absolute())
    # torch checkpoint
    from ..utils import torch_convert as tc

    sd = tc.load_torch_state_dict(str(p))
    if kind == "classifier":
        return tc.convert_classifier(sd, model_cfg)
    if kind == "backbone":
        params, stats = tc.convert_backbone(sd, model_cfg.backbone)
        out = {"params": {"backbone": params}}
        if stats:
            out["batch_stats"] = {"backbone": stats}
        return out
    return tc.convert_segmentor(sd, model_cfg)


def merge_pretrained(
    init_variables, loaded, *, verbose: bool = True, return_report: bool = False
):
    """Tolerant merge: copy loaded leaves onto the init tree where paths
    match, report missing/unexpected/shape-mismatched keys (reference
    loading.py:29-35).

    A leaf present in both trees but with a different shape is kept at its
    init value AND reported as mismatched — silently "loading" a
    dims-mismatched checkpoint would eval garbage with no warning.
    """
    from ..utils.torch_convert import report_diff

    flat_init = dict(
        jax.tree_util.tree_flatten_with_path(init_variables)[0]
    )
    flat_loaded = dict(jax.tree_util.tree_flatten_with_path(loaded)[0])
    merged = dict(flat_init)
    mismatched = []
    for k, v in flat_loaded.items():
        if k in merged:
            v = np.asarray(v)
            if merged[k].shape == v.shape:
                merged[k] = v
            else:
                mismatched.append(
                    (jax.tree_util.keystr(k), tuple(merged[k].shape), tuple(v.shape))
                )
    missing, unexpected = report_diff(init_variables, loaded)
    if verbose and (missing or unexpected or mismatched):
        print(f"[load] missing keys: {len(missing)}")
        for k in missing[:10]:
            print("   ", k)
        print(f"[load] unexpected keys: {len(unexpected)}")
        for k in unexpected[:10]:
            print("   ", k)
        print(f"[load] shape-mismatched keys (kept at init): {len(mismatched)}")
        for k, want, got in mismatched[:10]:
            print(f"    {k}: init {want} vs checkpoint {got}")
    treedef = jax.tree_util.tree_structure(init_variables)
    out = jax.tree_util.tree_unflatten(treedef, list(merged.values()))
    if return_report:
        return out, {
            "missing": missing,
            "unexpected": unexpected,
            "mismatched": mismatched,
        }
    return out
