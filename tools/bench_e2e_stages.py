"""Attribute the e2e-pose vs detect+peaks throughput gap, stage by stage.

bench.py round-3 measured the full demo-equivalent pipeline (images ->
grouped people) at ~285 img/s while the detect+peaks graph alone runs
~485 img/s — yet XLA counts only +1.5% FLOPs for the PRN+grouping stage.
This tool decomposes the difference on the real chip:

  A. detect+peaks graph, minimal fetch        (the 485 img/s baseline)
  B. e2e graph, minimal fetch                 (pure added GRAPH cost)
  C. e2e graph, full PoseAssignments fetch    (adds the D2H transfer)
  D. e2e graph, fetch + format_pose_batch     (adds the host tail
                                               = bench.py's headline)

B-A = device-side cost of PRN grids + PRN forward + device grouping.
C-B = cost of moving PoseAssignments to host (prints the tuple's bytes).
D-C = host dict-building cost (overlappable with device work in principle).

Usage: python tools/bench_e2e_stages.py [--f32] [--iters N] [--batch B]
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--max-people", type=int, default=20)
    args = ap.parse_args()

    from multiposenet_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from multiposenet_tpu.config import Config
    from multiposenet_tpu.models.posenet import PoseNet
    from multiposenet_tpu.engine.inference import (
        format_pose_batch, make_e2e_pose_pipeline, make_full_pipeline)

    cfg = Config()
    if not args.f32:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           compute_dtype=jnp.bfloat16))
    cfg = dataclasses.replace(
        cfg, prn=dataclasses.replace(cfg.prn, max_people=args.max_people))
    model = PoseNet(cfg.model)
    size = cfg.data.inp_size
    batch = args.batch

    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, size, size, 3), jnp.float32),
        jnp.zeros((1, cfg.model.prn_height, cfg.model.prn_width, 17),
                  jnp.float32),
        method=PoseNet.init_all)
    e2e = make_e2e_pose_pipeline(model, cfg, (size, size))
    detect = make_full_pipeline(model, cfg, (size, size))

    imgs = jnp.asarray((np.random.RandomState(0)
                        .rand(batch, size, size, 3) * 255).astype(np.uint8))
    scales = jnp.ones((batch,), jnp.float32)

    # warmup/compile
    out = detect(params, imgs)
    float(out.detections.scores[0, 0])
    _, assigns = e2e(params, imgs, scales)
    format_pose_batch(jax.device_get(assigns))

    n = args.iters

    def rate(dt):
        return batch * n / dt

    # A: detect+peaks, minimal fetch (one scalar array per iter)
    t0 = time.perf_counter()
    outs = [detect(params, imgs) for _ in range(n)]
    jax.device_get([o.detections.scores for o in outs])
    a = rate(time.perf_counter() - t0)

    # B: e2e, minimal fetch (chosen only: B*maxb*17 i32)
    t0 = time.perf_counter()
    outs = [e2e(params, imgs, scales)[1] for _ in range(n)]
    jax.device_get([o.chosen for o in outs])
    b = rate(time.perf_counter() - t0)

    # C: e2e, full PoseAssignments fetch
    t0 = time.perf_counter()
    outs = [e2e(params, imgs, scales)[1] for _ in range(n)]
    fetched = jax.device_get(outs)
    c = rate(time.perf_counter() - t0)

    nbytes = sum(np.asarray(x).nbytes for x in fetched[0])
    # D: + host formatting (bench.py protocol)
    t0 = time.perf_counter()
    outs = [e2e(params, imgs, scales)[1] for _ in range(n)]
    for o in outs:
        format_pose_batch(jax.device_get(o))
    d = rate(time.perf_counter() - t0)

    # host-only formatting cost on pre-fetched data
    t0 = time.perf_counter()
    for o in fetched:
        format_pose_batch(o)
    fmt_ms = (time.perf_counter() - t0) / n * 1000

    print(f"batch={batch} iters={n} "
          f"dtype={'f32' if args.f32 else 'bf16'} "
          f"max_people={args.max_people}")
    print(f"A detect+peaks minimal fetch : {a:7.1f} img/s")
    print(f"B e2e         minimal fetch : {b:7.1f} img/s   "
          f"(device PRN+grouping cost: {1000*batch*(1/b-1/a):+.1f} ms/batch)")
    print(f"C e2e         full fetch    : {c:7.1f} img/s   "
          f"(PoseAssignments D2H {nbytes/1e6:.1f} MB/batch: "
          f"{1000*batch*(1/c-1/b):+.1f} ms/batch)")
    print(f"D e2e         fetch+format  : {d:7.1f} img/s   "
          f"(host format alone: {fmt_ms:.1f} ms/batch)")


if __name__ == "__main__":
    main()
