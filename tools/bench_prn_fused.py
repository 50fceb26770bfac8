"""Device-busy A/B of cfg.prn.fused_mlp on the benched e2e graph.

VERDICT r4 item 5: the round-4 trace attributed ~2 ms/exec of the PRN
stage to the flatten/unflatten layout copies around the PRN MLP
(docs/PERF.md round-4 trace pass).  `_prn_mlp_eval` fuses the flatten
into the boundary Denses; this script measures both variants with the
tunnel-independent comparator (tools/profile_xplane.
device_busy_ms_per_exec) and prints one JSON line per variant.

Usage: python tools/bench_prn_fused.py [--f32] [--batch 64] [--iters 5]
"""

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from multiposenet_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from multiposenet_tpu.config import Config
    from multiposenet_tpu.engine.inference import make_e2e_pose_pipeline
    from multiposenet_tpu.models.posenet import PoseNet

    from multiposenet_tpu.utils.toolload import load_tool
    px = load_tool("profile_xplane")

    cfg = Config()
    if not args.f32:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           compute_dtype=jnp.bfloat16))
    cfg = dataclasses.replace(
        cfg, prn=dataclasses.replace(cfg.prn, max_people=20))
    model = PoseNet(cfg.model)
    size = cfg.data.inp_size

    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, size, size, 3), jnp.float32),
        jnp.zeros((1, cfg.model.prn_height, cfg.model.prn_width, 17),
                  jnp.float32),
        method=PoseNet.init_all)
    imgs = jnp.asarray((np.random.RandomState(0)
                        .rand(args.batch, size, size, 3) * 255)
                       .astype(np.uint8))
    scales = jnp.ones((args.batch,), jnp.float32)

    results = {}
    for fused in (False, True):
        c = dataclasses.replace(
            cfg, prn=dataclasses.replace(cfg.prn, fused_mlp=fused))
        pipe = make_e2e_pose_pipeline(model, c, (size, size))
        run = lambda: pipe(params, imgs, scales)[1].chosen  # noqa: E731
        busy = px.device_busy_ms_per_exec(run, n=args.iters)
        results["fused" if fused else "module"] = busy
        print(json.dumps({"variant": "fused" if fused else "module",
                          "device_busy_ms_per_exec": busy,
                          "batch": args.batch,
                          "dtype": "f32" if args.f32 else "bf16"}))
    if all(v is not None for v in results.values()):
        d = results["module"] - results["fused"]
        print(json.dumps({"delta_ms_module_minus_fused": round(d, 3)}))


if __name__ == "__main__":
    main()
