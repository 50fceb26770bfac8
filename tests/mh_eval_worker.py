"""Worker for test_two_process_distributed_coco_eval.

Joins a 2-process jax.distributed cluster (gloo CPU collectives) and runs
Evaluator.coco_eval with NO explicit shard: the evaluator must auto-shard
the image set by process, all-gather the per-shard results over the
cluster collectives (parallel.distributed.gather_objects), and score the
merged set on process 0 only.  The per-image network stage is stubbed to
emit GT so the distribution/merge bookkeeping is isolated.
"""
import sys

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

pid = int(sys.argv[1])
port = sys.argv[2]
root = sys.argv[3]
# "fail1" mode: process 1's eval loop raises mid-shard — the evaluator
# must still join the collective gather (no cluster hang) and re-raise;
# the healthy primary must refuse to score the partial set
mode = sys.argv[4] if len(sys.argv) > 4 else "ok"
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)

import dataclasses
import os

from multiposenet_tpu.config import Config
from multiposenet_tpu.data.coco_json import COCOIndex
from multiposenet_tpu.engine.evaluator import Evaluator

ann = os.path.join(root, "gt.json")
gt = COCOIndex(ann)
cfg = Config()
cfg = dataclasses.replace(
    cfg, eval=dataclasses.replace(cfg.eval, device_resize=False))
ev = Evaluator(cfg)
ev._get_outputs = lambda mult, img, bucket=64, with_flip=False: \
    (None, [[]], None, None)
seen = []


def finish(orig_heat, flip_heat, orig_bbox, img_h, name, img_id, peaks=None):
    seen.append(img_id)
    return [{"image_id": img_id, "category_id": 1,
             "keypoints": list(map(float, a["keypoints"])),
             "bbox": list(map(float, a["bbox"])), "score": 1.0}
            for a in gt.img_to_anns[img_id]]


ev._finish_image = finish
if mode == "fail1" and pid == 1:
    def boom(*a, **k):
        raise RuntimeError("injected shard failure")
    ev._get_outputs = boom

result_file = os.path.join(root, "merged.json") if pid == 0 else None
try:
    metrics = ev.coco_eval(ann_file=ann, img_dir=root,
                           result_file=result_file)
except Exception as e:
    print(f"RESULT {pid} error={type(e).__name__}: {e}", flush=True)
    sys.exit(3)
print(f"RESULT {pid} n={len(seen)} ap={metrics.get('AP', -1.0):.3f} "
      f"ids={sorted(seen)}", flush=True)
