"""Checkpoint I/O — orbax-backed, with the reference's resume semantics.

Covers what reference network/net_utils.py:12-110 + trainer.py:159-231 do
with HDF5 + pickled optimizer sidecars:

- save full TrainState (params, batch_stats, opt_state, step) + epoch
- auto-resume from the newest checkpoint in save_dir (trainer.py:159-168)
- prune old checkpoints (save_net max_n_ckpts)
- best-checkpoint tracking by val loss (trainer.py:203-211)
- PARTIAL loads: staged training starts a new stage from a checkpoint of a
  different stage — params load, optimizer state is discarded
  (`ignore_opt_state`, multipose_detection_train.py:44-45), and shape
  mismatches / missing keys are tolerated with a warning
  (net_utils.py:69-110).
"""

from __future__ import annotations

import concurrent.futures
import os
import re
import shutil
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from multiposenet_tpu.utils.logging import logger

# `ckpt_{epoch}` for epoch checkpoints, `ckpt_{epoch}_s{step}` for in-epoch
# (periodic/preemption) checkpoints; auto-resume orders by (epoch, step) so
# two preemptions inside one epoch never overwrite each other.
CKPT_RE = re.compile(r"ckpt_(\d+)(?:_s(\d+))?$")


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _ckpt_name(epoch: int, step: Optional[int] = None) -> str:
    return f"ckpt_{epoch}" if step is None else f"ckpt_{epoch}_s{step}"


def _checkpointer() -> ocp.Checkpointer:
    """Standard checkpointer; in multi-host runs the save barrier is
    restricted to process 0 — the engine device_gets the (replicated) state
    and only the primary host calls save (trainer.py is_primary gating), so
    a global barrier would deadlock waiting for the other hosts."""
    if jax.process_count() > 1:
        return ocp.Checkpointer(
            ocp.StandardCheckpointHandler(),
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=0, active_processes={0}))
    return ocp.StandardCheckpointer()


def save_checkpoint(save_dir: str, state, epoch: int,
                    max_n_ckpts: int = 0, step: Optional[int] = None) -> str:
    """Write `ckpt_{epoch}[_s{step}]` under save_dir; prune old ones if
    requested.  Pass `step` for in-epoch saves (save_freq_step, preemption)
    so they get distinct names (reference trainer.py:271-274 suffixed step
    ckpts the same way with `_{step}` in the filename)."""
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.abspath(os.path.join(save_dir, _ckpt_name(epoch, step)))
    ckptr = _checkpointer()
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr.save(path, jax.device_get(state))
    if hasattr(ckptr, "wait_until_finished"):  # async (single-host) flavor
        ckptr.wait_until_finished()

    if max_n_ckpts > 0:
        for e, s in list_checkpoints(save_dir)[:-max_n_ckpts]:
            victim = os.path.join(
                save_dir, _ckpt_name(e, s if s >= 0 else None))
            shutil.rmtree(victim, ignore_errors=True)
    return path


class AsyncSaver:
    """Background checkpoint writes — the train loop keeps dispatching.

    A synchronous save blocks the step loop on (a) `jax.device_get` of the
    full TrainState (params + opt state, ~250 MB for resnet101 — seconds on
    a remote-tunneled host) and (b) the orbax disk write.  The reference
    blocks the same way (net_utils.py:12-28 inside the epoch loop); on a TPU
    pod that stall is dead device time every save_freq_step.

    Donation safety: the jitted train steps donate the state buffers
    (train_steps.py donate_argnums), so a worker-thread `device_get` on the
    caller's array objects could race the NEXT step invalidating them.
    `save()` therefore snapshots the state with an async on-device copy ON
    THE CALLER THREAD — the copy is enqueued on the device stream *before*
    any later donating step, so XLA's program-order buffer liveness makes
    it race-free, and it costs one HBM copy (~1 ms for a resnet101 state),
    not a blocking D2H.  The worker then device_gets the private copy.

    A single worker serializes saves (and the pruning they trigger) in
    submission order.  Backpressure: each enqueued save pins a full
    on-device snapshot (~250 MB for resnet101) in HBM until the worker
    drains it, so `save()` blocks until the PREVIOUS save has finished —
    at most one snapshot is ever in flight, and a storage slower than
    save_freq_step degrades to synchronous saves instead of OOMing HBM.

    Failures are logged the moment they happen (done-callback), so a
    background save error is visible immediately, not only at the final
    `wait()`.  `wait()` drains every pending save, then re-raises the first
    failure — call it wherever the checkpoint must exist on disk
    (best-copy, end of training); the preemption path instead waits on its
    own save's Future so an earlier stale failure cannot mask a successful
    exit checkpoint (trainer.py stop path).
    """

    def __init__(self):
        self._pool: Optional[concurrent.futures.ThreadPoolExecutor] = None
        self._pending: List[concurrent.futures.Future] = []

    @staticmethod
    def _snapshot_leaf(x):
        # jax.Array: async on-device copy (see donation-safety note above).
        # np.ndarray: host copy — numpy leaves are shared by reference, so
        # an in-place host mutation after enqueue would race the write.
        if isinstance(x, jax.Array):
            return x.copy()
        if isinstance(x, np.ndarray):
            return np.array(x, copy=True)
        return x

    @staticmethod
    def _log_failure(fut: concurrent.futures.Future) -> None:
        exc = fut.exception()
        if exc is not None:
            logger.error("background checkpoint save failed: %r", exc)

    def save(self, save_dir: str, state, epoch: int, max_n_ckpts: int = 0,
             step: Optional[int] = None) -> concurrent.futures.Future:
        """Enqueue a save_checkpoint; returns a Future resolving to its path.

        Blocks (without raising) until any previous save completes, so at
        most one snapshot is pinned at a time."""
        if self._pool is None:
            self._pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="ckpt-save")
        if self._pending:
            concurrent.futures.wait(self._pending)
            # failures were logged by the done-callback; keep the futures so
            # wait() can still re-raise, but drop the succeeded ones
            self._pending = [f for f in self._pending if f.exception() is not None]
        snap = jax.tree.map(self._snapshot_leaf, state)
        fut = self._pool.submit(save_checkpoint, save_dir, snap, epoch,
                                max_n_ckpts, step)
        fut.add_done_callback(self._log_failure)
        self._pending.append(fut)
        return fut

    def wait(self) -> Optional[str]:
        """Block until every enqueued save has finished; re-raise the first
        failure AFTER all have completed (later failures are logged by the
        done-callback, never silently dropped); return the newest
        successful save's path (None if nothing pending)."""
        pending, self._pending = self._pending, []
        concurrent.futures.wait(pending)
        path = None
        first_exc = None
        for fut in pending:
            exc = fut.exception()
            if exc is not None:
                if first_exc is None:
                    first_exc = exc
            else:
                path = fut.result()
        if first_exc is not None:
            raise first_exc
        return path


def list_checkpoints(save_dir: str):
    """Sorted (epoch, step) tuples; epoch ckpts sort after their in-epoch
    step ckpts (step -1 sentinel means 'end of epoch' — an epoch save
    supersedes any step save made during it)."""
    if not os.path.isdir(save_dir):
        return []
    out = []
    for name in os.listdir(save_dir):
        m = CKPT_RE.match(name)
        if m and os.path.isdir(os.path.join(save_dir, name)):
            epoch = int(m.group(1))
            step = int(m.group(2)) if m.group(2) is not None else -1
            # epoch ckpt for epoch e outranks step ckpts of epoch e; encode
            # by sorting step -1 as +inf within the epoch
            out.append((epoch, step))
    return sorted(out, key=lambda t: (t[0], float("inf") if t[1] < 0 else t[1]))


def latest_checkpoint(save_dir: str) -> Optional[str]:
    """Newest ckpt path for auto-resume (reference trainer.py:159-168)."""
    ckpts = list_checkpoints(save_dir)
    if not ckpts:
        return None
    e, s = ckpts[-1]
    return os.path.join(save_dir, _ckpt_name(e, s if s >= 0 else None))


def restore_checkpoint(path: str, state_template):
    """Full restore into a same-structure TrainState."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=jax.device_get(state_template))


def _unflatten(flat: Dict[Tuple[str, ...], Any]) -> Dict:
    tree: Dict = {}
    for path_k, v in flat.items():
        d = tree
        for p in path_k[:-1]:
            d = d.setdefault(p, {})
        d[path_k[-1]] = v
    return tree


def _merge_partial(src_tree, dst_template) -> Tuple[Any, Dict[str, int]]:
    """Copy leaves of src_tree into the template where path+shape match.

    Mirrors net_utils.load_net tolerance (net_utils.py:69-110): missing keys
    keep the template value, shape mismatches are skipped with a warning.
    """
    flat_src = _flatten(src_tree)
    flat_dst = _flatten(jax.device_get(dst_template))

    loaded = skipped = missing = 0
    out = {}
    for k, v in flat_dst.items():
        if k in flat_src and tuple(np.shape(flat_src[k])) == tuple(np.shape(v)):
            out[k] = np.asarray(flat_src[k])
            loaded += 1
        else:
            if k in flat_src:
                logger.warning("shape mismatch for %s: ckpt %s vs model %s",
                               "/".join(k), np.shape(flat_src[k]), np.shape(v))
                skipped += 1
            else:
                missing += 1
            out[k] = v
    stats = {"loaded": loaded, "shape_skipped": skipped, "missing": missing}
    return _unflatten(out), stats


def _restore_raw(path: str):
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path))


def restore_params_partial(path: str, params_template) -> Tuple[Any, Dict[str, int]]:
    """Load only matching param leaves from a checkpoint of any stage.

    Returns (params, stats dict).  NOTE: params only — callers that also
    hold BN running statistics must use restore_variables_partial /
    restore_model_state_partial, or the trained batch_stats silently revert
    to their (mean 0, var 1) init.
    """
    raw = _restore_raw(path)
    out, stats = _merge_partial(raw.get("params", raw), params_template)
    logger.info("partial restore from %s: %s", path, stats)
    return out, stats


def restore_model_state_partial(path: str, params_template,
                                batch_stats_template
                                ) -> Tuple[Any, Any, Dict[str, int]]:
    """Partial-load the full model state: params AND BN running stats.

    The reference's load_net restores the whole state_dict — weights and
    BatchNorm running_mean/running_var together (net_utils.py:69-110), and
    every staged-training driver and the Tester go through it.  Accepts
    both TrainState checkpoints ({'params','batch_stats',...}) and
    converted reference checkpoints (tools/convert_torch_ckpt.py writes
    {'params','batch_stats'}).  A checkpoint with no batch_stats at all
    (foreign/legacy) keeps the template stats with a loud warning.
    Returns (params, batch_stats, combined stats dict).
    """
    raw = _restore_raw(path)
    params, p_stats = _merge_partial(raw.get("params", raw), params_template)
    src_bs = raw.get("batch_stats")
    if src_bs:
        batch_stats, b_stats = _merge_partial(src_bs, batch_stats_template)
    else:
        batch_stats = jax.device_get(batch_stats_template)
        n = len(_flatten(batch_stats))
        b_stats = {"loaded": 0, "shape_skipped": 0, "missing": n}
        if n:
            logger.warning(
                "checkpoint %s carries no batch_stats — BN running "
                "statistics keep their init values (mean 0, var 1)", path)
    stats = {k: p_stats[k] + b_stats[k] for k in p_stats}
    stats["bn_loaded"] = b_stats["loaded"]
    logger.info("partial model-state restore from %s: %s", path, stats)
    return params, batch_stats, stats


def restore_variables_partial(path: str, variables_template
                              ) -> Tuple[Dict, Dict[str, int]]:
    """restore_model_state_partial over a Flax variables dict
    ({'params': ..., 'batch_stats': ...})."""
    params, batch_stats, stats = restore_model_state_partial(
        path, variables_template["params"],
        variables_template.get("batch_stats", {}))
    out = dict(variables_template, params=params)
    if "batch_stats" in variables_template:
        out["batch_stats"] = batch_stats
    return out, stats


def copy_best(ckpt_path: str, val_loss: float) -> str:
    """Best-model copy `ckpt_{e}_{loss}.best` (reference trainer.py:203-211)."""
    best = f"{ckpt_path}_{val_loss:.5f}.best"
    if os.path.exists(best):
        shutil.rmtree(best)
    shutil.copytree(ckpt_path, best)
    return best
