"""Multi-host (pod-slice) runtime — jax.distributed + per-host data sharding.

The reference has no multi-node story at all (single-process
`nn.DataParallel`, SURVEY.md section 2.6).  On TPU pods the idiomatic scale-up
is one Python process per host, all chips joined into one global mesh by
`jax.distributed.initialize`; each host feeds only its local shard of the
global batch and XLA's collectives ride ICI/DCN.  This module is the thin
runtime layer for that:

- `initialize()`    — join (or skip, single-host) the jax.distributed cluster
- `process_count()`/`process_index()`/`is_primary()` — host topology helpers
- `local_batch_slice(global_batch)` — this host's share of a global batch

Single-host behavior is identical to not importing this module: initialize()
is a no-op without a coordinator, process_count() == 1, and the primary guard
is always true — so the engine can call these unconditionally.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from multiposenet_tpu.utils.logging import logger

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Join the multi-host cluster; returns True if distributed mode is on.

    Multi-host mode is explicit opt-in: pass a coordinator address (CLI
    --coordinator), set JAX_COORDINATOR_ADDRESS, or set MPN_DISTRIBUTED=1 to
    use jax.distributed's cluster auto-detection (TPU metadata / SLURM / MPI
    env).  Otherwise stays single-process.  (Auto-detection can't key off
    TPU env vars alone: single-host TPU environments also set them.)
    Safe to call twice.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not explicit and os.environ.get("MPN_DISTRIBUTED") != "1":
        return False
    jax.distributed.initialize(
        coordinator_address=explicit,
        num_processes=num_processes, process_id=process_id)
    _initialized = True
    logger.info("jax.distributed: process %d/%d, %d local / %d global devices",
                jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())
    return jax.process_count() > 1


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """True on the host that owns checkpoint/metric/log writes."""
    return jax.process_index() == 0


def per_host_batch(global_batch_size: int) -> int:
    """This host's share of the global batch; global must divide evenly."""
    n = jax.process_count()
    if global_batch_size % n != 0:
        raise ValueError(
            f"global batch_size {global_batch_size} must be divisible by the "
            f"process count {n}")
    return global_batch_size // n


def gather_objects(obj, decode: bool = True):
    """All-gather one picklable-as-JSON object per process; every process
    returns the list [obj_from_process_0, ..., obj_from_process_{P-1}].

    Rides the cluster's own collectives (jax.experimental.multihost_utils
    over ICI/gloo) — shard results never touch a shared filesystem, which
    multi-host pods don't have.  Encoding: JSON -> utf-8 bytes -> uint8
    arrays, length-allgathered first so ragged payloads pad to one shape.
    Single-process: returns [obj].

    `decode=False` still participates in the collectives (every process
    MUST call this or the others hang) but returns None without paying
    the JSON decode of everyone else's payload — for processes that only
    contribute and discard (e.g. non-primary eval hosts).
    """
    import json as _json

    if jax.process_count() == 1:
        return [obj] if decode else None
    import numpy as _np
    from jax.experimental import multihost_utils as mhu

    data = _np.frombuffer(_json.dumps(obj).encode("utf-8"), _np.uint8)
    sizes = _np.asarray(mhu.process_allgather(
        _np.asarray([data.size], _np.int64)))          # (P, 1)
    padded = _np.zeros(int(sizes.max()), _np.uint8)
    padded[:data.size] = data
    allp = _np.asarray(mhu.process_allgather(padded))  # (P, maxn)
    if not decode:
        return None
    return [_json.loads(bytes(allp[p, :int(sizes[p, 0])]).decode("utf-8"))
            for p in range(sizes.shape[0])]
