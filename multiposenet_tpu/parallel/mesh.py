"""Device mesh + sharding helpers — the framework's parallelism layer.

The reference's only parallelism is single-process `nn.DataParallel`
scatter/gather with a custom list-aware wrapper (reference
datasets/data_parallel.py:8-87, SURVEY.md section 2.6).  The TPU-native
equivalent: a `jax.sharding.Mesh` over all chips, inputs sharded on the batch
axis with `NamedSharding`, parameters replicated, and XLA inserting the
gradient all-reduce over ICI automatically when the jitted train step is
compiled with these shardings.  No explicit collectives, no process groups.

MultiPoseNet is a ~50M-param CNN: pure data parallelism is the right mapping
(no attention/MoE — TP/PP/SP/EP have nothing to shard; SURVEY.md section 2.6).
The mesh abstraction still carries an optional second `model` axis so larger
backbones can shard conv channels later without touching the engine.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Sequence[int] = (-1,), axes: Sequence[str] = ("data",),
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a Mesh; -1 in `shape` absorbs all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    shape = list(shape)
    known = int(np.prod([s for s in shape if s != -1]))
    if -1 in shape:
        shape[shape.index(-1)] = len(devices) // max(known, 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host pytree onto the mesh, batch-sharded on dim 0.

    Single-process: a plain device_put split over local devices.
    Multi-host (jax.distributed): `batch` is this host's LOCAL slice of the
    global batch (see parallel.distributed.per_host_batch + Loader's
    shard_id/num_shards); the global array is assembled from the per-process
    shards without any cross-host copy.
    """
    sh = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, x), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
