"""Structured metrics logging — JSONL scalars + optional TensorBoard.

The reference has a dead tensorboardX hook (use_tensorboard flag with no
SummaryWriter ever constructed, reference training/trainer.py:29-41,78-79).
Here: every scalar the loss builders emit lands in a `metrics.jsonl` stream
(cheap, grep-able, survives anything), and when TensorFlow is importable a
tf.summary writer mirrors them for TensorBoard.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict


class MetricsWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "metrics.jsonl"), "a",
                       buffering=1)
        self._tb = None
        if use_tensorboard:
            try:
                import tensorflow as tf  # noqa: optional
                self._tb = tf.summary.create_file_writer(
                    os.path.join(log_dir, "tb"))
            except Exception:
                self._tb = None

    def write(self, step: int, scalars: Dict[str, float],
              prefix: str = ""):
        rec = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            try:
                rec[prefix + k] = float(v)
            except (TypeError, ValueError):
                continue
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                for k, v in rec.items():
                    if k not in ("step", "time"):
                        tf.summary.scalar(k, v, step=step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class StepProfiler:
    """jax.profiler wrapper: capture a trace for steps [start, start+count).

    The reference's profiling story is tic/toc pairs (lib/utils/timer.py);
    on TPU the useful artifact is an XLA trace viewable in TensorBoard /
    Perfetto.
    """

    def __init__(self, log_dir: str, start_step: int = 10, num_steps: int = 5):
        self.log_dir = log_dir
        self.start = start_step
        self.stop = start_step + num_steps
        self._active = False

    def step(self, step: int):
        import jax
        if step == self.start and not self._active:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif step >= self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False
