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


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


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
        payload = [
            ln for ln in out.strip().splitlines() if ln.startswith('{"proc"')
        ]
        assert payload, f"no result line in worker output:\n{out[-2000:]}\n{err[-2000:]}"
        outs.append(json.loads(payload[-1]))

    # disjoint loader shards covering the 8-item dataset
    idx0 = set(outs[0]["local_indices"])
    idx1 = set(outs[1]["local_indices"])
    assert idx0.isdisjoint(idx1)
    assert idx0 | idx1 == set(range(8))
    # both processes agree on the globally-reduced values
    assert outs[0]["total"] == outs[1]["total"] == 18.0
    assert outs[0]["counters"] == outs[1]["counters"] == [3, 30]
