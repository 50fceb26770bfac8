"""FLOPs-grounded MFU for the TRAINING step (the inference twin lives in
bench.py; VERDICT r2 item 1 asked for a roofline grounded in XLA's own
cost analysis rather than trace extrapolation).

Counts the exact jitted train step's FLOPs by lowering a twin of the
step for the CPU platform and running `hlo_module_cost_analysis` (the
axon client exposes no cost analysis), then times the same step on the
real chip with the chained-dispatch protocol PERF.md's training table
uses, and prints GFLOPs/image, TFLOP/s and MFU.

Usage: python tools/bench_train_mfu.py [--subnet keypoint] [--batch 16]
       [--size 480] [--backbone resnet101] [--f32] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from multiposenet_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()

# v5e peaks (docs/PERF.md "Roofline")
PEAK_FLOPS = {"bfloat16": 197e12, "float32": 98.5e12}


def make_batch(subnet, cfg, batch, size, rng):
    if subnet == "keypoint":
        joints = np.full((batch, 4, 18, 3), 2.0, np.float32)
        for p in range(2):
            joints[:, p, :, 0] = rng.uniform(5, size - 5, (batch, 18))
            joints[:, p, :, 1] = rng.uniform(5, size - 5, (batch, 18))
        joints[:, 2:, :, 2] = 0.0
        return {
            "image": (rng.rand(batch, size, size, 3) * 255).astype(np.uint8),
            "joints": joints,
            "mask": np.ones((batch, size // 4, size // 4), np.float32),
        }
    if subnet == "detection":
        boxes = np.full((batch, cfg.data.max_gt_boxes, 5), -1.0, np.float32)
        boxes[:, 0] = [40.0, 40.0, 200.0, 260.0, 0.0]
        boxes[:, 1] = [250.0, 100.0, 380.0, 300.0, 0.0]
        return {
            "image": (rng.rand(batch, size, size, 3) * 255).astype(np.uint8),
            "boxes": boxes,
        }
    gh, gw = cfg.model.prn_height, cfg.model.prn_width
    inp = np.zeros((batch, gh, gw, 17), np.float32)
    lab = np.zeros((batch, gh, gw, 17), np.float32)
    ys = rng.randint(2, gh - 2, (batch, 17))
    xs = rng.randint(2, gw - 2, (batch, 17))
    for b in range(batch):
        inp[b, ys[b], xs[b], np.arange(17)] = 1.0
        lab[b, ys[b], xs[b], np.arange(17)] = 1.0
    return {"weights_marks": inp, "label_marks": lab}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subnet", default="keypoint",
                    choices=["keypoint", "detection", "prn"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=480)
    ap.add_argument("--backbone", default="resnet101")
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--prn-grids", default="conv", choices=["matmul", "conv"],
                    help="PRN grid-build formulation A/B (train_steps."
                         "make_prn_steps grid_impl; 'conv' is the measured "
                         "winner and the step default)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from multiposenet_tpu.config import Config, DataConfig, ModelConfig
    from multiposenet_tpu.engine import train_steps as ts
    from multiposenet_tpu.models.posenet import PoseNet

    dtype_name = "float32" if args.f32 else "bfloat16"
    cfg = Config(
        model=ModelConfig(backbone=args.backbone,
                          compute_dtype=(jnp.float32 if args.f32
                                         else jnp.bfloat16)),
        data=DataConfig(inp_size=args.size))
    size = cfg.data.inp_size if args.subnet != "detection" else args.size
    model = PoseNet(cfg.model)
    state, tx, mask = ts.create_train_state(
        model, cfg, jax.random.PRNGKey(0), (size, size), args.subnet)
    factory = {"keypoint": ts.make_keypoint_steps,
               "detection": ts.make_detection_steps,
               "prn": ts.make_prn_steps}[args.subnet]
    kw = {"image_hw": (size, size)} if args.subnet == "detection" else {}
    if args.subnet == "prn":
        kw["grid_impl"] = args.prn_grids
    train_step, _ = factory(model, cfg, tx, mask, **kw)

    batch = make_batch(args.subnet, cfg, args.batch, size,
                       np.random.RandomState(0))
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    lr = jnp.asarray(1e-4, jnp.float32)
    extra = ()
    if args.subnet == "prn":  # dropout rng (train_steps.make_prn_steps)
        extra = (jax.random.PRNGKey(1),)

    # ---- FLOPs: CPU lowering of the SAME step graph ----------------------
    gflops_per_image = None
    try:
        from jax._src.lib import xla_client as _xc
        low = train_step.trace(
            jax.eval_shape(lambda: state),
            {k: jax.ShapeDtypeStruct(v.shape, v.dtype)
             for k, v in dev_batch.items()},
            jax.ShapeDtypeStruct(lr.shape, lr.dtype),
            *(jax.ShapeDtypeStruct(e.shape, e.dtype) for e in extra),
        ).lower(lowering_platforms=("cpu",))
        props = _xc._xla.hlo_module_cost_analysis(
            jax.devices("cpu")[0].client,
            low.compiler_ir("hlo").as_hlo_module())
        gflops_per_image = float(props["flops"]) / args.batch / 1e9
    except Exception as e:  # keep the timing half usable regardless
        print(f"# cost analysis unavailable: {e!r}", file=sys.stderr)

    # ---- timing: chained dispatch on the default (TPU) backend -----------
    # consume a RESULT scalar, not block_until_ready: on the axon remote
    # runtime a bare block_until_ready does not reliably wait for execution
    # (same protocol as bench.py).  Each step consumes the previous state,
    # so fetching the final loss forces the whole chain.
    state, logs = train_step(state, dev_batch, lr, *extra)
    float(logs["loss"])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, logs = train_step(state, dev_batch, lr, *extra)
    float(logs["loss"])
    dt = time.perf_counter() - t0
    ms = dt / args.iters * 1000
    ips = args.batch * args.iters / dt

    out = {"subnet": args.subnet, "dtype": dtype_name, "batch": args.batch,
           **({"grid_impl": args.prn_grids} if args.subnet == "prn" else {}),
           "size": size, "ms_per_step": round(ms, 1),
           "images_per_sec": round(ips, 1),
           "gflops_per_image": (round(gflops_per_image, 1)
                                if gflops_per_image else None)}
    if gflops_per_image and jax.default_backend() != "cpu":
        tflops = ips * gflops_per_image / 1e3
        out["tflops_per_sec"] = round(tflops, 1)
        out["mfu"] = round(tflops * 1e12 / PEAK_FLOPS[dtype_name], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
