"""Training engine — the reference Trainer (training/trainer.py:108-362)
rebuilt around jitted, mesh-sharded step functions.

Feature parity:
- epoch loop with per-step meters, fps/ETA logging (print_freq)
- periodic step checkpoints (save_freq_step) + epoch checkpoints
- in-epoch quick validation every val_freq steps (val_nbatch batches)
- end-of-epoch validation (val_nbatch_end_epoch), best-ckpt copy
- ReduceLROnPlateau on val loss (factor lr_decay, patience, min mode)
- auto-resume from newest checkpoint when cfg.train.ckpt is None
- staged init: partial param load from another stage's checkpoint
  (ignore_opt_state) and epoch reset (zero_epoch)
- epoch hooks (on_start_epoch / on_end_epoch)

TPU-first differences: loss/targets computed inside the jitted step; the LR
is a scalar argument (plateau updates never recompile); device_prefetch
overlaps H2D with compute.
"""

from __future__ import annotations

import datetime
import os
import signal
from typing import Callable, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp

from multiposenet_tpu.config import Config
from multiposenet_tpu.engine import checkpoint as ckpt_lib
from multiposenet_tpu.engine.train_steps import (
    STEP_FACTORIES,
    create_train_state,
)
from multiposenet_tpu.models.posenet import PoseNet
from multiposenet_tpu.parallel import make_mesh, replicated, shard_batch
from multiposenet_tpu.parallel import distributed as dist
from multiposenet_tpu.utils.logging import logger
from multiposenet_tpu.utils.meters import AverageValueMeter
from multiposenet_tpu.utils.metrics import MetricsWriter
from multiposenet_tpu.utils.timer import Timer


class ReduceLROnPlateau:
    """min-mode plateau scheduler (torch semantics: factor, patience)."""

    def __init__(self, init_lr: float, factor: float = 0.1, patience: int = 3,
                 min_lr: float = 0.0):
        self.lr = init_lr
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = float("inf")
        self.num_bad = 0

    def step(self, metric: float) -> float:
        if metric < self.best:
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                new_lr = max(self.lr * self.factor, self.min_lr)
                if new_lr < self.lr:
                    logger.info("plateau: reducing lr %.3g -> %.3g", self.lr, new_lr)
                self.lr = new_lr
                self.num_bad = 0
        return self.lr


class Trainer:
    def __init__(self, cfg: Config, model: Optional[PoseNet] = None,
                 train_data: Optional[Iterable] = None,
                 val_data: Optional[Iterable] = None,
                 mesh=None, init_ckpt_params: Optional[str] = None):
        self.cfg = cfg
        self.model = model or PoseNet(cfg.model)
        self.train_data = train_data
        self.val_data = val_data
        self.mesh = mesh if mesh is not None else make_mesh(
            cfg.train.mesh_shape, cfg.train.mesh_axes)
        n_dev = self.mesh.devices.size
        if cfg.train.batch_size % n_dev != 0:
            raise ValueError(
                f"batch_size {cfg.train.batch_size} must be divisible by the "
                f"mesh device count {n_dev} (data-parallel sharding); "
                f"use --batch-size {((cfg.train.batch_size // n_dev) + 1) * n_dev} "
                f"or a smaller mesh")
        self.subnet = cfg.train.subnet
        self.save_dir = os.path.join(cfg.train.save_dir, cfg.train.exp_name)

        self.last_epoch = 0
        self.global_step = 0
        self.batch_timer = Timer()
        self.data_timer = Timer()
        self.on_start_epoch_hooks: List[Callable] = []
        self.on_end_epoch_hooks: List[Callable] = []

        size = cfg.data.inp_size
        self.state, self.tx, self.mask = create_train_state(
            self.model, cfg, jax.random.PRNGKey(cfg.train.seed),
            (size, size), self.subnet)

        # staged init: partial params + BN running stats from another
        # stage's ckpt (the reference's load_net carries running_mean/var
        # in the state_dict, net_utils.py:69-110 — critical here because
        # the detection/PRN stages freeze BN and run on running stats)
        if init_ckpt_params:
            params, batch_stats, _ = ckpt_lib.restore_model_state_partial(
                init_ckpt_params, self.state.params, self.state.batch_stats)
            self.state = self.state.replace(
                params=jax.tree.map(jnp.asarray, params),
                batch_stats=jax.tree.map(jnp.asarray, batch_stats))

        # resume (reference trainer.py:152-168)
        resume = cfg.train.ckpt
        if resume is None and not cfg.train.re_init:
            resume = ckpt_lib.latest_checkpoint(self.save_dir)
        if resume and os.path.isdir(resume):
            if cfg.train.ignore_opt_state:
                params, batch_stats, _ = ckpt_lib.restore_model_state_partial(
                    resume, self.state.params, self.state.batch_stats)
                self.state = self.state.replace(
                    params=jax.tree.map(jnp.asarray, params),
                    batch_stats=jax.tree.map(jnp.asarray, batch_stats))
            else:
                self.state = ckpt_lib.restore_checkpoint(resume, self.state)
                if not cfg.train.zero_epoch:
                    self.last_epoch = int(self.state.step) // max(
                        1, len(train_data) if train_data is not None else 1)
                    m = ckpt_lib.CKPT_RE.match(os.path.basename(resume))
                    if m:
                        self.last_epoch = int(m.group(1))
                        if m.group(2) is not None:
                            # mid-epoch (step/preemption) ckpt: the epoch it
                            # was taken in did not finish — re-run it
                            self.last_epoch -= 1
            # keep the step-ckpt name sequence monotonic across resumes:
            # without this, post-resume ckpt_{e}_s{N} names restart at low N,
            # making latest_checkpoint() prefer a STALE pre-preemption ckpt
            # and pruning evict the newest one
            self.global_step = int(self.state.step)
            logger.info("resumed from %s (epoch %d, step %d)", resume,
                        self.last_epoch, self.global_step)

        if dist.process_count() > 1:
            # multi-host: checkpoints are written by the primary only; if
            # save_dir is not on a shared filesystem the other hosts restored
            # nothing (or something older).  Broadcast process 0's state so
            # the 'replicated' placement below is actually replicated.
            from jax.experimental import multihost_utils
            self.state = multihost_utils.broadcast_one_to_all(self.state)

        self.state = jax.device_put(self.state, replicated(self.mesh))
        factory = STEP_FACTORIES[self.subnet]
        kw = {}
        if self.subnet == "detection":
            kw["image_hw"] = (size, size)
        self.train_step, self.val_step = factory(
            self.model, cfg, self.tx, self.mask, mesh=self.mesh, **kw)

        self.scheduler = ReduceLROnPlateau(
            cfg.train.init_lr, cfg.train.lr_decay, cfg.train.plateau_patience)
        self._rng = jax.random.PRNGKey(cfg.train.seed + 1)
        # multi-host: only the primary host writes ckpts/metrics; validation
        # and the plateau scheduler run on every host with identical inputs,
        # so LR decisions stay in lockstep without a collective
        self.is_primary = dist.is_primary()
        self.metrics = MetricsWriter(self.save_dir) if self.is_primary else None
        # background checkpoint writes: the step loop never blocks on the
        # state device_get + orbax disk write (checkpoint.AsyncSaver); waits
        # happen only where the file must exist (best-copy, preemption, end)
        self.saver = ckpt_lib.AsyncSaver()
        self._stop_requested = False

    def install_signal_handlers(self):
        """Graceful preemption: SIGTERM/SIGINT finish the current step,
        checkpoint, then exit the epoch loop — the auto-resume path
        (trainer.py:159-168 semantics) picks the run back up.  TPU pods get
        preempted; the reference had no story for this."""
        def _handler(signum, _frame):
            logger.warning("signal %d received: will checkpoint and stop "
                           "after the current step", signum)
            self._stop_requested = True
        signal.signal(signal.SIGTERM, _handler)
        signal.signal(signal.SIGINT, _handler)

    # ------------------------------------------------------------------

    def _step_args(self, lr):
        if self.subnet == "prn":
            self._rng, sub = jax.random.split(self._rng)
            return (jnp.asarray(lr), sub)
        return (jnp.asarray(lr),)

    def train(self):
        best_loss = float("inf")
        for _ in range(self.last_epoch, self.cfg.train.max_epoch):
            self.last_epoch += 1
            logger.info("Start training epoch %d", self.last_epoch)
            for hook in self.on_start_epoch_hooks:
                hook(self)

            self._train_one_epoch()

            for hook in self.on_end_epoch_hooks:
                hook(self)

            if (self.last_epoch % self.cfg.train.save_freq_epoch == 0
                    or self.last_epoch == self.cfg.train.max_epoch):
                path_fut = None
                if self.is_primary:
                    # async: the save overlaps the end-of-epoch validation
                    path_fut = self.saver.save(
                        self.save_dir, self.state, self.last_epoch,
                        self.cfg.train.save_nckpt_max)
                if self.cfg.train.val_nbatch_end_epoch > 0 and self.val_data is not None:
                    val_loss = self.validate(self.cfg.train.val_nbatch_end_epoch)
                    if val_loss < best_loss:
                        if path_fut is not None:
                            best = ckpt_lib.copy_best(path_fut.result(), val_loss)
                            logger.info("found better ckpt (%.5f -> %.5f): %s",
                                        best_loss, val_loss, best)
                        best_loss = val_loss
                    self.scheduler.step(val_loss)
        self.saver.wait()

    def _flush_logs(self, pending, meters) -> Optional[Dict[str, float]]:
        """Fetch all buffered per-step device logs in ONE transfer and feed
        the meters.  Returns the newest step's logs as host floats."""
        if not pending:
            return None
        fetched = jax.device_get(pending)
        pending.clear()
        for logs in fetched:
            for k, v in logs.items():
                meters.setdefault(k, AverageValueMeter()).add(float(v))
        return {k: float(v) for k, v in fetched[-1].items()}

    def _train_one_epoch(self):
        cfg = self.cfg.train
        meters: Dict[str, AverageValueMeter] = {}
        self.batch_timer.clear()
        self.data_timer.clear()
        self.data_timer.tic()

        n_batches = len(self.train_data) if hasattr(self.train_data, "__len__") else None
        # overlap H2D with compute: batches are placed on the mesh two steps
        # ahead of consumption (data/loader.device_prefetch)
        from multiposenet_tpu.data.loader import device_prefetch
        prefetched = device_prefetch(
            iter(self.train_data), lambda b: shard_batch(self.mesh, b), depth=2)
        # per-step logs stay ON DEVICE between prints: a float() per scalar
        # per step would block on the async dispatch queue and defeat the
        # prefetch overlap (one host read costs ~30 ms on a remote runtime,
        # rivaling the step itself).  One jax.device_get per print_freq
        # fetches the whole buffered window.
        pending: List[Dict] = []
        self.batch_timer.tic()
        interval_steps = 0
        for step, batch in enumerate(prefetched):
            self.data_timer.toc(average=False)
            self.state, logs = self.train_step(
                self.state, batch, *self._step_args(self.scheduler.lr))
            pending.append(logs)
            self.global_step += 1
            interval_steps += 1

            if step % cfg.print_freq == 0:
                newest = self._flush_logs(pending, meters)  # syncs the queue
                # average step wall-time over the whole print interval — the
                # honest per-step number under async dispatch
                step_time = self.batch_timer.toc(average=False) / interval_steps
                self._print_log(step, n_batches, meters, step_time)
                if self.metrics is not None:
                    self.metrics.write(self.global_step, newest, prefix="train/")
                self.batch_timer.tic()
                interval_steps = 0

            if self.global_step % cfg.save_freq_step == 0 and self.is_primary:
                self._flush_logs(pending, meters)
                self.saver.save(self.save_dir, self.state, self.last_epoch,
                                cfg.save_nckpt_max, step=self.global_step)

            if (self.val_data is not None and cfg.val_freq > 0
                    and self.global_step % cfg.val_freq == 0):
                self.validate(cfg.val_nbatch)

            if self._stop_requested:
                if self.is_primary:
                    fut = self.saver.save(
                        self.save_dir, self.state, self.last_epoch,
                        cfg.save_nckpt_max, step=self.global_step)
                    # wait on THIS save's future (not saver.wait()): an
                    # earlier background-save failure — already logged by the
                    # saver's done-callback — must not mask a successful
                    # preemption checkpoint / clean SystemExit(0)
                    path = fut.result()
                    logger.info("checkpointed at step %d after stop request "
                                "(%s)", self.global_step, path)
                raise SystemExit(0)

            self.data_timer.tic()
        self._flush_logs(pending, meters)

    def validate(self, max_batches: int) -> float:
        """Meter EVERY scalar the val step emits (per-stage losses, max/min
        heatmap, ...), mirroring the reference's val loss breadth
        (evaluate/tester.py:515-543 via _process_log); returns mean 'loss'.
        Device logs are buffered and fetched in one transfer."""
        pending = []
        for i, batch in enumerate(self.val_data):
            if i >= max_batches:
                break
            batch = shard_batch(self.mesh, batch)
            pending.append(self.val_step(self.state, batch))
        meters: Dict[str, AverageValueMeter] = {}
        newest = self._flush_logs(pending, meters)
        if newest is None:
            logger.warning("validation loader produced no batches "
                           "(dataset smaller than batch_size?)")
            return float("inf")
        means = {k: m.value()[0] for k, m in meters.items()}
        logger.info("validation (%d batches): %s", meters["loss"].n,
                    "  ".join(f"{k}={v:.6f}" for k, v in sorted(means.items())))
        if self.metrics is not None:
            self.metrics.write(self.global_step, means, prefix="val/")
        return means["loss"]

    def _print_log(self, step, n_batches, meters, step_time: float):
        lines = [f"{self.cfg.train.exp_name}: epoch {self.last_epoch} "
                 f"[{step}/{n_batches or '?'}] lr={self.scheduler.lr:.2e}"]
        for k, m in meters.items():
            mean, _ = m.value()
            lines.append(f"\t{k}: {mean:.10f}")
        bt = step_time + 1e-9
        dt = self.data_timer.duration + 1e-9
        fps = self.cfg.train.batch_size / bt
        if n_batches:
            rest = datetime.timedelta(seconds=int((n_batches - step) * bt))
        else:
            rest = "?"
        lines.append(f"\t({dt:.3f}/{bt:.3f}s, fps:{fps:.1f}, rest: {rest})")
        logger.info("\n".join(lines))
