"""Orbax checkpoint manager: save/restore/gc/best/backbone-export."""

import numpy as np
import pytest

import jax.numpy as jnp

from dat_segmentation_tpu.train.checkpoint import (
    CheckpointManager,
    merge_pretrained,
    save_backbone_only,
)


def _tree(seed=0):
    rng = np.random.RandomState(seed)
    return {
        "step": np.asarray(seed, np.int32),
        "params": {
            "backbone": {"w": rng.randn(4, 4).astype(np.float32)},
            "decode_head": {"b": rng.randn(3).astype(np.float32)},
        },
    }


def test_save_restore_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    tree = _tree(7)
    mgr.save(7, tree, metadata={"iter": 7})
    out = mgr.restore(7, target=_tree(0))
    assert int(out["step"]) == 7
    np.testing.assert_allclose(
        out["params"]["backbone"]["w"], tree["params"]["backbone"]["w"]
    )
    assert mgr.latest_step() == 7
    assert (tmp_path / "ckpt_7.meta.json").exists()


def test_gc_keeps_latest(tmp_path):
    mgr = CheckpointManager(str(tmp_path), max_to_keep=2)
    for s in (1, 2, 3, 4):
        mgr.save(s, _tree(s))
    assert mgr.latest_step() == 4
    assert not (tmp_path / "ckpt_1").exists()
    assert not (tmp_path / "ckpt_2").exists()
    assert (tmp_path / "ckpt_3").exists()
    assert (tmp_path / "ckpt_4").exists()


def test_best_tag_not_gced(tmp_path):
    mgr = CheckpointManager(str(tmp_path), max_to_keep=1)
    mgr.save("best", _tree(1))
    for s in (1, 2, 3):
        mgr.save(s, _tree(s))
    assert (tmp_path / "ckpt_best").exists()


def test_backbone_only_export(tmp_path):
    params = _tree(3)["params"]
    save_backbone_only(str(tmp_path / "bb"), params)
    import orbax.checkpoint as ocp

    loaded = ocp.StandardCheckpointer().restore(str(tmp_path / "bb"))
    assert set(loaded.keys()) == {"backbone"}
    np.testing.assert_allclose(
        loaded["backbone"]["w"], params["backbone"]["w"]
    )


def test_merge_pretrained_tolerant():
    init = {
        "params": {
            "a": np.zeros((2, 2), np.float32),
            "b": np.zeros((3,), np.float32),
            "c": np.zeros((4,), np.float32),
        }
    }
    loaded = {
        "params": {
            "a": np.ones((2, 2), np.float32),
            "b": np.ones((5,), np.float32),  # shape mismatch -> skipped
            "d": np.ones((1,), np.float32),  # unexpected -> ignored
        }
    }
    merged = merge_pretrained(init, loaded, verbose=False)
    np.testing.assert_allclose(merged["params"]["a"], 1.0)
    np.testing.assert_allclose(merged["params"]["b"], 0.0)
    np.testing.assert_allclose(merged["params"]["c"], 0.0)


def test_merge_pretrained_reports_shape_mismatch(capsys):
    """A both-trees key with the wrong shape must be REPORTED, not
    silently kept at init (the reference reports via strict=False load
    logging, loading.py:29-35)."""
    init = {"params": {"a": np.zeros((2, 2), np.float32),
                       "b": np.zeros((3,), np.float32)}}
    loaded = {"params": {"a": np.ones((2, 2), np.float32),
                         "b": np.ones((5,), np.float32)}}
    merged, report = merge_pretrained(
        init, loaded, verbose=True, return_report=True
    )
    assert len(report["mismatched"]) == 1
    key, want, got = report["mismatched"][0]
    assert "b" in key and want == (3,) and got == (5,)
    assert not report["missing"] and not report["unexpected"]
    out = capsys.readouterr().out
    assert "shape-mismatched" in out and "(3,)" in out and "(5,)" in out
    np.testing.assert_allclose(merged["params"]["b"], 0.0)
