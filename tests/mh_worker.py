"""Worker process for tests/test_distributed.py::test_two_process_cluster.

Joins a 2-process jax.distributed cluster over gloo CPU collectives, builds
the global mesh, feeds a per-host batch shard through shard_batch, and checks
the jitted global mean sees both hosts' data.
"""
import sys

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

pid = int(sys.argv[1])
port = sys.argv[2]
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)

import numpy as np
import jax.numpy as jnp

from multiposenet_tpu.data.loader import Loader
from multiposenet_tpu.parallel import make_mesh, shard_batch
from multiposenet_tpu.parallel import distributed as dist

assert dist.process_count() == 2
assert dist.is_primary() == (pid == 0)
assert jax.device_count() == 4
assert dist.per_host_batch(8) == 4

mesh = make_mesh()
local = {"x": (np.arange(4, dtype=np.float32) + pid * 4).reshape(4, 1)}
g = shard_batch(mesh, local)
assert g["x"].shape == (8, 1), g["x"].shape
m = float(jax.jit(lambda b: jnp.mean(b["x"]))(g))
assert abs(m - 3.5) < 1e-6, m


class DS:
    def __len__(self):
        return 16

    def __getitem__(self, i, rng=None):
        return {"i": np.asarray([i], np.int64)}


ld = Loader(DS(), batch_size=4, shuffle=True, num_workers=1,
            shard_id=pid, num_shards=2)
seen = sorted(int(b["i"][j, 0]) for b in ld for j in range(4))
print(f"RESULT {pid} mean={m} seen={seen}", flush=True)
