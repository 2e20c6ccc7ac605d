"""CLI integration: tools/train.py + tools/test.py end-to-end on synthetic
data in subprocesses (fresh JAX processes, CPU platform)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REPO = Path(__file__).resolve().parent.parent

TINY_OVERRIDES = [
    "model.backbone.depths=(1,1,1,1)",
    "model.backbone.dims=(8,16,32,64)",
    "model.backbone.dim_stem=8",
    "model.backbone.heads=(2,2,4,4)",
    "model.backbone.groups=(1,2,2,4)",
    "model.backbone.stage_spec=(('X',),('D',),('D',),('D',))",
    "data.batch_size=2",
    "data.crop_size=(64,64)",
    "data.num_workers=2",
    "schedule.max_iters=3",
    "schedule.warmup_iters=1",
    "log_interval=1",
    "checkpoint_interval=3",
    "eval_interval=1000",
    "dtype=float32",
    "mesh_shape={'data':1}",
]


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    return env


def _run(args, cwd=REPO):
    # force cpu inside the child (the axon sitecustomize pins the platform)
    script = str(REPO / args[0])
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        f"import sys; sys.argv = {args!r};"
        f"exec(compile(open({script!r}).read(), {script!r}, 'exec'),"
        f" {{'__name__': '__main__', '__file__': {script!r}}})"
    )
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=cwd, env=_env(), capture_output=True, text=True, timeout=900,
    )


def _seg_data(tmp_path):
    for split, n in (("training", 4), ("validation", 2)):
        img_dir = tmp_path / "images" / split
        ann_dir = tmp_path / "annotations" / split
        img_dir.mkdir(parents=True)
        ann_dir.mkdir(parents=True)
        for i in range(n):
            rs = np.random.RandomState(i)
            cv2.imwrite(
                str(img_dir / f"{split}_{i}.jpg"),
                rs.randint(0, 255, (70, 90, 3), np.uint8),
            )
            cv2.imwrite(
                str(ann_dir / f"{split}_{i}.png"),
                rs.randint(1, 20, (70, 90)).astype(np.uint8),
            )
    return tmp_path


@pytest.mark.slow
def test_train_then_eval_cli(tmp_path):
    data = _seg_data(tmp_path / "data")
    work = tmp_path / "work"

    r = _run(
        ["tools/train.py", "upn_tiny_160k_dp03_lr6",
         "--data-root", str(data), "--work-dir", str(work),
         "--max-iters", "3", "--set", *TINY_OVERRIDES]
    )
    assert r.returncode == 0, r.stderr[-3000:]
    ckpt = work / "upn_tiny_160k_dp03_lr6" / "ckpt_3"
    assert ckpt.exists(), list(work.rglob("*"))

    out_json = tmp_path / "res.json"
    r = _run(
        ["tools/test.py", "upn_tiny_160k_dp03_lr6", str(ckpt),
         "--data-root", str(data), "--max-images", "2",
         "--out", str(out_json), "--set", *TINY_OVERRIDES]
    )
    assert r.returncode == 0, r.stderr[-3000:]
    res = json.loads(out_json.read_text())
    assert 0.0 <= res["mIoU"] <= 1.0
    assert res["num_images"] == 2
