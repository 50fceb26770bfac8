"""Measure ms/step THROUGH Trainer._train_one_epoch (VERDICT r1 item 3).

Round 1's training numbers came from a chained-dispatch protocol around the
bare jitted step (docs/PERF.md "Training throughput"); the engine loop was
never timed.  This drives the real epoch loop — device_prefetch, buffered
log fetches, meters, print_freq logging — over an in-memory synthetic
loader (no disk IO: this isolates ENGINE overhead, tools/bench_loader.py
covers the host input pipeline) and reports ms/step for comparison against
the chained number.

Usage: python tools/bench_trainer_loop.py [--steps 30] [--batch 16]
       [--size 480] [--backbone resnet101] [--f32]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from multiposenet_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=480)
    ap.add_argument("--backbone", default="resnet101")
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--print-freq", type=int, default=10)
    ap.add_argument("--preput", action="store_true",
                    help="pre-shard all batches onto the mesh before timing "
                         "(isolates ENGINE overhead from tunnel H2D cost)")
    ap.add_argument("--chained", action="store_true",
                    help="also time the round-1 chained bare-step protocol "
                         "in this same process for an apples-to-apples "
                         "denominator")
    ap.add_argument("--save-freq-step", type=int, default=10 ** 9,
                    help="checkpoint every N steps inside the timed epoch "
                         "(measures the save stall)")
    ap.add_argument("--sync-save", action="store_true",
                    help="force SYNCHRONOUS saves (the pre-AsyncSaver "
                         "behavior) for an A/B against the background saver")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from multiposenet_tpu.config import (Config, DataConfig, ModelConfig,
                                         TrainConfig)
    from multiposenet_tpu.engine.trainer import Trainer

    size = args.size
    cfg = Config(
        model=ModelConfig(
            backbone=args.backbone,
            compute_dtype=jnp.float32 if args.f32 else jnp.bfloat16),
        data=DataConfig(inp_size=size),
        train=TrainConfig(batch_size=args.batch, max_epoch=1,
                          print_freq=args.print_freq, val_freq=0,
                          val_nbatch_end_epoch=0,
                          save_freq_step=args.save_freq_step,
                          save_dir="/tmp/mpn_bench_models",
                          exp_name="bench_loop", re_init=True))

    rng = np.random.RandomState(0)

    def make_batch():
        b = args.batch
        joints = np.full((b, 4, 18, 3), 2.0, np.float32)
        for p in range(2):
            joints[:, p, :, 0] = rng.uniform(5, size - 5, (b, 18))
            joints[:, p, :, 1] = rng.uniform(5, size - 5, (b, 18))
            joints[:, p, :, 2] = 1.0
        return {"image": (rng.rand(b, size, size, 3) * 255).astype(np.uint8),
                "joints": joints,
                "mask": np.ones((b, size // 4, size // 4), np.float32)}

    batches = [make_batch() for _ in range(4)]

    t = Trainer(cfg, train_data=batches)  # warmup epoch: compile + caches
    if args.sync_save:
        # the pre-AsyncSaver behavior: block the loop on device_get + write
        import concurrent.futures

        from multiposenet_tpu.engine import checkpoint as ckpt_lib

        class SyncSaver:
            def save(self, *a, **kw):
                f = concurrent.futures.Future()
                f.set_result(ckpt_lib.save_checkpoint(*a, **kw))
                return f

            def wait(self):
                return None

        t.saver = SyncSaver()
    t.train_data = batches
    t0 = time.perf_counter()
    t._train_one_epoch()
    warm = time.perf_counter() - t0

    epoch_batches = [batches[i % len(batches)] for i in range(args.steps)]
    if args.preput:
        # place once; shard_batch on an already-identically-sharded array
        # is a no-op, so the timed loop pays zero H2D
        from multiposenet_tpu.parallel import shard_batch
        epoch_batches = [shard_batch(t.mesh, b) for b in epoch_batches]
        jax.block_until_ready(epoch_batches)

    t.train_data = epoch_batches
    t0 = time.perf_counter()
    t._train_one_epoch()
    dt = time.perf_counter() - t0

    result = {
        "metric": "trainer_epoch_ms_per_step",
        "value": round(dt / args.steps * 1000.0, 2),
        "images_per_sec": round(args.batch / (dt / args.steps), 1),
        "steps": args.steps, "batch": args.batch, "size": size,
        "backbone": args.backbone,
        "dtype": "f32" if args.f32 else "bf16",
        "preput": bool(args.preput),
        "save_freq_step": (args.save_freq_step
                           if args.save_freq_step < 10 ** 9 else None),
        "sync_save": bool(args.sync_save),
        "warmup_epoch_s": round(warm, 2),
        "backend": jax.default_backend(),
    }

    if args.chained:
        # round-1 protocol: one device-resident batch, chained donated
        # steps, ONE final fetch (docs/PERF.md "Measurement methodology")
        from multiposenet_tpu.parallel import shard_batch
        dev_batch = shard_batch(t.mesh, batches[0])
        jax.block_until_ready(dev_batch)
        state = t.state
        lr = t._step_args(t.scheduler.lr)
        state, logs = t.train_step(state, dev_batch, *lr)  # warm
        jax.device_get(logs)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, logs = t.train_step(state, dev_batch, *lr)
        jax.device_get(logs)
        chained = (time.perf_counter() - t0) / args.steps * 1000.0
        result["chained_ms_per_step"] = round(chained, 2)
        result["engine_overhead_pct"] = round(
            (result["value"] / chained - 1.0) * 100.0, 1)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
