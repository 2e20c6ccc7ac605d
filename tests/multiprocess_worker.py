"""Worker script for the 2-process distributed simulation test.

Each process owns 2 virtual CPU devices and joins a real
jax.distributed coordinator on localhost, forming a 4-device global
'data' mesh across 2 processes — the same topology class as one process
per TPU host. Exercises:
  * DataLoader shard_info disjointness,
  * shard_batch's make_array_from_process_local_data path,
  * a pjit-compiled global sum (the DP grad-reduction primitive),
  * multihost_utils counter reduction (distributed eval collection).

Run by tests/test_multiprocess.py; prints one JSON line on success.
"""

import json
import os
import sys

proc_id = int(sys.argv[1])
num_procs = int(sys.argv[2])
port = sys.argv[3]

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=num_procs,
    process_id=proc_id,
)

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dat_segmentation_tpu.parallel.mesh import (
    local_batch_size,
    make_mesh,
    process_shard_info,
    shard_batch,
)

assert jax.process_count() == num_procs, jax.process_count()
assert len(jax.devices()) == 2 * num_procs, len(jax.devices())

mesh = make_mesh({"data": 2 * num_procs})

# --- loader sharding: disjoint per-process index slices ----------------
class _Range:
    def __len__(self):
        return 8

    def __getitem__(self, i):
        return {"x": np.full((2,), i, np.float32)}


from dat_segmentation_tpu.data.loader import DataLoader

rank, world = process_shard_info()
assert (rank, world) == (proc_id, num_procs)
loader = DataLoader(_Range(), batch_size=local_batch_size(4),
                    shard_info=(rank, world))
local_indices = loader._epoch_indices(0)

# --- global batch assembly across processes ----------------------------
# global batch of 4: each process contributes rows [2*pid, 2*pid+1]
local = {
    "image": np.stack(
        [np.full((3,), 2 * proc_id + j, np.float32) for j in range(2)]
    )
}
sharded = shard_batch(mesh, local)
assert sharded["image"].shape == (4, 3), sharded["image"].shape

# --- pjit global reduction over the mesh -------------------------------
from jax.sharding import NamedSharding, PartitionSpec as P

total = jax.jit(
    lambda x: jnp.sum(x),
    in_shardings=NamedSharding(mesh, P("data")),
    out_shardings=NamedSharding(mesh, P()),
)(sharded["image"])
got_total = float(jax.device_get(total))
want_total = float(sum(3 * i for i in range(4)))  # rows are constant i
assert got_total == want_total, (got_total, want_total)

# --- multihost_utils counter reduction (eval collection) ---------------
from jax.experimental import multihost_utils

counter = np.array([proc_id + 1, 10 * (proc_id + 1)], np.int32)
gathered = np.asarray(multihost_utils.process_allgather(jnp.asarray(counter)))
summed = gathered.sum(axis=0)
expect = np.array(
    [sum(range(1, num_procs + 1)), 10 * sum(range(1, num_procs + 1))]
)
assert (summed == expect).all(), (summed, expect)

print(json.dumps({
    "proc": proc_id,
    "local_indices": [int(i) for i in local_indices],
    "total": got_total,
    "counters": [int(v) for v in summed],
}))
