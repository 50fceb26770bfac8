"""Measure a 'reference-shaped' per-image baseline on the SAME hardware
(VERDICT r1 item 7): the reference's serialization pattern — batch 1, one
dispatch per image, the FULL heatmap tensor fetched to the host each image,
host-side peak finding, host grouping — driven through this framework's f32
graph.

This grounds bench.py's `vs_baseline`: the reference pipeline
(evaluate/tester.py:195-254) cannot run an image faster than this on this
chip, because this measurement already gives it every reference-absent
advantage (no per-person PRN round-trips — one batched PRN dispatch; XLA
fused forward; no cv2 preprocessing).  The true torch reference would be
strictly slower; using this number as the denominator is conservative.

Usage: python tools/bench_reference_shaped.py [--images 30] [--size 480]
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--images", type=int, default=30)
    ap.add_argument("--size", type=int, default=480)
    ap.add_argument("--backbone", default="resnet101")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from multiposenet_tpu.config import Config, ModelConfig
    from multiposenet_tpu.engine.evaluator import Evaluator, drop_neck
    from multiposenet_tpu.engine.inference import make_full_pipeline
    from multiposenet_tpu.eval.multiscale import joint_list_from_heatmaps
    from multiposenet_tpu.models.posenet import PoseNet

    size = args.size
    cfg = Config(model=ModelConfig(backbone=args.backbone))  # f32, like torch
    model = PoseNet(cfg.model)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3), jnp.float32),
        jnp.zeros((1, cfg.model.prn_height, cfg.model.prn_width, 17),
                  jnp.float32),
        method=PoseNet.init_all)
    ev = Evaluator(cfg, model, params)

    # reference shape: forward WITHOUT device peaks; heatmaps come home
    pipeline = make_full_pipeline(model, cfg, (size, size), with_peaks=False)

    rng = np.random.RandomState(0)
    imgs = [(rng.rand(1, size, size, 3) * 255).astype(np.uint8)
            for _ in range(args.images)]

    def one_image(img):
        out = pipeline(params, jnp.asarray(img))          # batch 1 dispatch
        heat = np.asarray(out.heatmaps[0], np.float32)    # FULL map D2H
        keep = np.asarray(out.detections.keep[0])
        boxes = np.asarray(out.detections.boxes[0])[keep]
        scores = np.asarray(out.detections.scores[0])[keep]
        # host peak finding + subpixel refine (reference tester.py:215-230)
        jl = joint_list_from_heatmaps(heat, size, 1.0, thre1=cfg.peaks.thre1)
        jl = drop_neck(jl)
        sel = scores > cfg.detection.test_score_thresh
        bx = [[b[0], b[1], b[2], b[3]] for b in boxes[sel]]
        return ev.prn_process(jl, bx, "bench", 0)

    one_image(imgs[0])  # warmup/compile

    t0 = time.perf_counter()
    for img in imgs:
        one_image(img)
    dt = time.perf_counter() - t0

    ips = args.images / dt
    print(json.dumps({
        "metric": "reference_shaped_images_per_sec",
        "value": round(ips, 2),
        "ms_per_image": round(dt / args.images * 1000.0, 1),
        "images": args.images, "size": size, "backbone": args.backbone,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
