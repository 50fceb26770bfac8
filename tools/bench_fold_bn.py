"""A/B the BN-folded inference graph (models/fold_bn.py) on real hardware.

Measures the detect+peaks pipeline (the bench.py stage-A graph) and the
full e2e pose pipeline with and without cfg.model.fold_bn, same
variables (folded via fold_bn_variables for the B arm), and prints
img/s + the max output deviation between the arms on one batch.

Usage: python tools/bench_fold_bn.py [--batch 64] [--iters 10] [--f32]
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--e2e", action="store_true")
    args = ap.parse_args()

    from multiposenet_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from multiposenet_tpu.config import Config
    from multiposenet_tpu.engine.inference import (
        make_e2e_pose_pipeline, make_full_pipeline)
    from multiposenet_tpu.models.fold_bn import fold_bn_variables
    from multiposenet_tpu.models.posenet import PoseNet

    base = Config()
    if not args.f32:
        base = dataclasses.replace(base, model=dataclasses.replace(
            base.model, compute_dtype=jnp.bfloat16))
    base = dataclasses.replace(
        base, prn=dataclasses.replace(base.prn, max_people=20))
    size = base.data.inp_size
    batch = args.batch

    model = PoseNet(base.model)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, size, size, 3), jnp.float32),
        jnp.zeros((1, base.model.prn_height, base.model.prn_width, 17),
                  jnp.float32),
        method=PoseNet.init_all)

    imgs = jnp.asarray((np.random.RandomState(0)
                        .rand(batch, size, size, 3) * 255).astype(np.uint8))
    scales = jnp.ones((batch,), jnp.float32)

    def build(cfg, variables):
        m = PoseNet(cfg.model)
        if args.e2e:
            pipe = make_e2e_pose_pipeline(m, cfg, (size, size))
            return lambda: pipe(variables, imgs, scales)
        pipe = make_full_pipeline(m, cfg, (size, size))
        return lambda: pipe(variables, imgs)

    def bench(run, label):
        out = run()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [run() for _ in range(args.iters)]
        jax.block_until_ready(outs)
        dt = time.perf_counter() - t0
        ips = batch * args.iters / dt
        print(f"{label:12s} {dt / args.iters * 1000:8.2f} ms/exec "
              f"{ips:7.1f} img/s")
        return out, ips

    folded_cfg = dataclasses.replace(base, model=dataclasses.replace(
        base.model, fold_bn=True))
    folded_vars = fold_bn_variables(variables)

    out_a, ips_a = bench(build(base, variables), "unfolded")
    out_b, ips_b = bench(build(folded_cfg, folded_vars), "fold_bn")

    leaves_a = jax.tree_util.tree_leaves(jax.device_get(out_a))
    leaves_b = jax.tree_util.tree_leaves(jax.device_get(out_b))
    dev = max(
        float(np.max(np.abs(np.asarray(a, np.float32)
                            - np.asarray(b, np.float32))))
        if a.size else 0.0
        for a, b in zip(leaves_a, leaves_b))
    print(f"speedup {ips_b / ips_a:.3f}x   max |A-B| over all outputs: "
          f"{dev:.3e}")


if __name__ == "__main__":
    main()
