"""Real 2-process distributed simulation on CPU.

Spawns two python processes that join a jax.distributed coordinator on
localhost (2 virtual CPU devices each -> a 4-device global mesh over 2
processes), validating the full multi-host data-parallel contract the
reference gets from torchrun+DistributedSampler+NCCL
(new_train.py:83,121, tools/test.py:290-298):
  * per-process loader shards are disjoint and cover the dataset,
  * shard_batch assembles a global array from process-local data,
  * pjit reduces across the process boundary,
  * multihost_utils sums eval counters across processes.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest


def _parse_result(out: str, err: str) -> dict:
    """Last parseable '{"proc"...}' line; full diagnostics on failure
    (a starved/odd worker can emit noise around the result line)."""
    for ln in reversed(out.strip().splitlines()):
        if ln.startswith('{"proc"'):
            try:
                return json.loads(ln)
            except json.JSONDecodeError:
                continue
    raise AssertionError(
        f"no parseable result line:\n{out[-2000:]}\n{err[-2000:]}"
    )


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_trainer_soak(tmp_path):
    """Full train->eval cycle through trainer_seg on 2 processes: same
    loss trajectory as single-process (same global batches on the same
    2-device mesh), identical eval mIoU via the in-run distributed
    reduction, and checkpoints written by rank 0 only."""
    cv2 = pytest.importorskip("cv2")
    import numpy as np

    # tiny ADE-layout dataset (mirrors test_trainers._seg_data)
    root = tmp_path / "data"
    for split, cnt in (("training", 6), ("validation", 2)):
        img_dir = root / "images" / split
        ann_dir = root / "annotations" / split
        img_dir.mkdir(parents=True)
        ann_dir.mkdir(parents=True)
        for i in range(cnt):
            # stable seed: hash() is salted per interpreter (PYTHONHASHSEED),
            # which would make every run's synthetic dataset different and
            # any tolerance failure unreproducible
            rs = np.random.RandomState(
                {"training": 100, "validation": 200}[split] + i
            )
            cv2.imwrite(str(img_dir / f"{split}_{i}.jpg"),
                        rs.randint(0, 255, (70, 90, 3), np.uint8))
            cv2.imwrite(str(ann_dir / f"{split}_{i}.png"),
                        rs.randint(1, 11, (70, 90)).astype(np.uint8))

    worker = Path(__file__).parent / "multiprocess_train_worker.py"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = str(worker.parent.parent) + os.pathsep + env.get(
        "PYTHONPATH", ""
    )

    def run(num_procs, work_dir):
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), str(i), str(num_procs),
                 str(port), str(root), str(work_dir)],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                env=env, text=True,
            )
            for i in range(num_procs)
        ]
        outs = []
        for p in procs:
            # generous: gloo ranks spin-wait, so a 1-core host runs the
            # 2-process leg at a fraction of real-time (measured 689s for
            # the 2-proc leg with a warm leg-1 compile cache — the SPMD
            # programs differ across topologies, so leg 2 compiles fresh)
            out, err = p.communicate(timeout=1500)
            assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
            outs.append(_parse_result(out, err))
        return outs

    single = run(1, tmp_path / "work1")[0]
    duo = run(2, tmp_path / "work2")

    assert len(single["losses"]) == 6
    # both ranks observed the identical (globally-reduced) trajectory
    assert duo[0]["losses"] == duo[1]["losses"]
    assert duo[0]["val_miou"] == duo[1]["val_miou"]
    # same global batches => same losses up to reduction-order float noise
    np.testing.assert_allclose(
        single["losses"], duo[0]["losses"], rtol=2e-4, atol=1e-5
    )
    # the distributed counter REDUCTION is exact (integers), but the
    # trained params differ across topologies by reduction-order float
    # noise, which flips argmax on boundary pixels — near-random early
    # predictions make mIoU wobble at the 1e-3 absolute level
    np.testing.assert_allclose(
        single["val_miou"], duo[0]["val_miou"], atol=5e-3
    )
    # rank 0 wrote the checkpoints; the run produced the expected set
    assert "ckpt_3" in duo[0]["ckpts"] and "ckpt_6" in duo[0]["ckpts"]


def test_two_process_data_parallel_contract():
    worker = Path(__file__).parent / "multiprocess_worker.py"
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = str(worker.parent.parent) + os.pathsep + env.get(
        "PYTHONPATH", ""
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=570)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(_parse_result(out, err))

    # disjoint loader shards covering the 8-item dataset
    idx0 = set(outs[0]["local_indices"])
    idx1 = set(outs[1]["local_indices"])
    assert idx0.isdisjoint(idx1)
    assert idx0 | idx1 == set(range(8))
    # both processes agree on the globally-reduced values
    assert outs[0]["total"] == outs[1]["total"] == 18.0
    assert outs[0]["counters"] == outs[1]["counters"] == [3, 30]
