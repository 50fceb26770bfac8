"""Input-pipeline throughput benchmark (host side).

The measured bf16 batch-16 keypoint train step consumes ~217 img/s/chip
(docs/PERF.md); the reference feeds its trainer with 8 worker PROCESSES
(datasets/coco.py:31-36), while this framework uses threads (cv2 releases
the GIL, but add_neck/augment bookkeeping/stacking hold it).  This tool
answers whether threads sustain the demand: it generates a synthetic
COCO-sized keypoint dataset on disk (640x480 JPEGs + mask_miss PNGs +
Realtime-MPP-style index records, the exact format KeypointDataset reads)
and measures end-to-end Loader throughput (decode + augment + target
assembly + batch stacking) for several worker counts.

Usage:
  python tools/bench_loader.py [--images 96] [--batch 16] [--epochs 3]
                               [--workers 1,2,4,8,16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multiposenet_tpu.config import DataConfig  # noqa: E402
from multiposenet_tpu.data.datasets import KeypointDataset  # noqa: E402
from multiposenet_tpu.data.loader import Loader  # noqa: E402


def make_synthetic_dataset(root: str, n_images: int, seed: int = 0):
    """COCO-shaped keypoint records: images, mask_miss PNGs, index records
    (reference COCO.json 'root' entries, datasets/coco.py:17-36)."""
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "images")
    mask_dir = os.path.join(root, "mask2014")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)
    records = []
    for i in range(n_images):
        h, w = 480, 640
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        # blur a little so JPEG sizes resemble photos, not noise
        img = cv2.GaussianBlur(img, (5, 5), 2.0)
        stem = f"{i:012d}"
        rel = f"images/COCO_train2014_{stem}.jpg"
        cv2.imwrite(os.path.join(root, rel), img)
        mask = np.full((h, w), 255, np.uint8)
        cv2.imwrite(os.path.join(mask_dir,
                                 f"train2014_mask_miss_{stem}.png"), mask)

        def person(cx, cy):
            j = np.zeros((17, 3), np.float32)
            j[:, 0] = cx + rng.uniform(-60, 60, 17)
            j[:, 1] = cy + rng.uniform(-90, 90, 17)
            j[:, 2] = rng.choice([0.0, 1.0, 2.0], 17, p=[0.2, 0.5, 0.3])
            return j

        n_other = int(rng.randint(0, 4))
        others = [person(rng.uniform(100, w - 100), rng.uniform(100, h - 100))
                  for _ in range(n_other)]
        records.append({
            "dataset": "COCO",
            "isValidation": 0.0,
            "img_paths": rel,
            "img_width": w, "img_height": h,
            "objpos": [float(rng.uniform(150, w - 150)),
                       float(rng.uniform(150, h - 150))],
            "scale_provided": float(rng.uniform(0.6, 1.4)),
            "joint_self": person(w / 2, h / 2).tolist(),
            "joint_others": [o.tolist() for o in others],
            "numOtherPeople": n_other,
        })
    return records


def measure(loader: Loader, epochs: int) -> float:
    """Steady-state samples/sec over `epochs` full passes (first batch of
    the first pass excluded — thread spin-up)."""
    n = 0
    t0 = None
    for _ in range(epochs):
        for batch in loader:
            if t0 is None:
                t0 = time.perf_counter()  # start after the first batch lands
                continue
            n += batch["image"].shape[0]
    if t0 is None or n == 0:
        sys.exit("error: need at least 2 batches to measure; increase "
                 "--images (drop_last trims partial batches) or --epochs")
    return n / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=96)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--workers", default="1,2,4,8,16")
    ap.add_argument("--root", default=None,
                    help="reuse an existing synthetic dataset dir")
    args = ap.parse_args()

    root = args.root or tempfile.mkdtemp(prefix="mpn_loader_bench_")
    if not os.path.exists(os.path.join(root, "images")):
        print(f"generating {args.images} synthetic images under {root} ...",
              file=sys.stderr)
        records = make_synthetic_dataset(root, args.images)
        with open(os.path.join(root, "index.json"), "w") as f:
            json.dump(records, f)
    with open(os.path.join(root, "index.json")) as f:
        records = json.load(f)

    cfg = DataConfig(inp_size=480)
    ds = KeypointDataset(records, list(range(len(records))), root, root, cfg,
                         augment=True)

    results = {}
    for workers in [int(w) for w in args.workers.split(",")]:
        loader = Loader(ds, args.batch, shuffle=True, num_workers=workers,
                        seed=0, prefetch=4)
        sps = measure(loader, args.epochs)
        results[workers] = round(sps, 1)
        print(json.dumps({"workers": workers, "samples_per_sec": results[workers],
                          "batch": args.batch, "inp_size": cfg.inp_size}))
    best = max(results.values())
    print(json.dumps({"metric": "loader_samples_per_sec",
                      "best": best, "by_workers": results}))


if __name__ == "__main__":
    main()
