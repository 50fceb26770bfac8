"""End-to-end integration tests.

test_coco_eval_machinery: drives Evaluator.coco_eval with the network
stubbed to emit GT-derived heatmaps/boxes.  Everything downstream is real:
multi-scale averaging, flip-swap averaging, host peak finding with sub-pixel
refinement, neck-drop reindexing, the jitted PRN stage (random weights —
scores only need to be positive), greedy grouping, COCO reordering, and the
OKS evaluator.  If any joint-order table, coordinate transform, or
assignment rule is wrong, AP collapses from 1.0.

test_keypoint_overfit_recovers_peaks: trains the real keypoint subnet on one
synthetic batch until the inference pipeline's peak finder recovers the
planted joints — the full learn->infer loop.
"""

import os

import cv2
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiposenet_tpu.config import Config, ModelConfig, DataConfig
from multiposenet_tpu.data.coco_json import COCOIndex
from multiposenet_tpu.data.datasets import add_neck
from multiposenet_tpu.engine.evaluator import Evaluator
from multiposenet_tpu.models.posenet import PoseNet
from multiposenet_tpu.ops.heatmap import make_heatmaps_np


def _person_kps(cx, cy):
    """17 visible COCO keypoints spread around (cx, cy)."""
    rng = np.random.RandomState(int(cx) * 7 + int(cy))
    kps = []
    for j in range(17):
        kps += [cx + (j % 5) * 6 - 12 + rng.randint(0, 2),
                cy + (j // 5) * 8 - 12 + rng.randint(0, 2), 2]
    return kps


def _bbox_from_kps(kps):
    xs, ys = kps[0::3], kps[1::3]
    x0, y0 = min(xs) - 6, min(ys) - 6
    return [x0, y0, max(xs) - x0 + 6, max(ys) - y0 + 6]


@pytest.fixture(scope="module")
def synthetic_coco(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    imgs, anns = [], []
    aid = 1
    for img_id, centers in [(1, [(45, 60), (150, 70)]),
                            (2, [(60, 100)])]:
        h, w = 160, 224
        img = (np.random.RandomState(img_id).rand(h, w, 3) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(str(root), f"{img_id}.jpg"), img)
        imgs.append({"id": img_id, "height": h, "width": w,
                     "file_name": f"{img_id}.jpg"})
        for cx, cy in centers:
            kps = _person_kps(cx, cy)
            bbox = _bbox_from_kps(kps)
            anns.append({"id": aid, "image_id": img_id, "category_id": 1,
                         "iscrowd": 0, "num_keypoints": 17,
                         "area": bbox[2] * bbox[3], "bbox": bbox,
                         "keypoints": kps})
            aid += 1
    gt = {"images": imgs, "categories": [{"id": 1, "name": "person"}],
          "annotations": anns}
    import json
    ann_file = os.path.join(str(root), "gt.json")
    with open(ann_file, "w") as f:
        json.dump(gt, f)
    return str(root), ann_file, gt


def test_coco_eval_machinery(synthetic_coco):
    img_dir, ann_file, gt = synthetic_coco

    cfg = Config(model=ModelConfig(backbone="resnet50"),
                 data=DataConfig(inp_size=128))
    import dataclasses
    cfg = dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, inp_size=128,
                                      scale_search=(0.5, 1.0, 1.5),
                                      # route through the stubbed
                                      # _get_outputs host path
                                      device_resize=False))
    model = PoseNet(cfg.model)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, cfg.model.prn_height, cfg.model.prn_width, 17)),
        method=PoseNet.init_all)
    ev = Evaluator(cfg, model, variables)

    # stub the network stage: GT-derived heatmaps at original resolution and
    # GT boxes for every scale; flip handled by the caller flipping `img`
    by_name = {}
    gt_idx = COCOIndex(dataset=gt)
    for img_rec in gt["images"]:
        joints18 = []
        boxes = []
        for ann in gt_idx.img_to_anns[img_rec["id"]]:
            j17 = np.asarray(ann["keypoints"], np.float64).reshape(17, 3)
            # heatmap-drawing convention: v<=1 drawn (COCO v=2 -> internal 1)
            j17[:, 2] = np.where(j17[:, 2] == 2, 1.0, 2.0)
            joints18.append(add_neck(j17))
            b = ann["bbox"]
            boxes.append([b[0], b[1], b[0] + b[2], b[1] + b[3]])
        by_name[img_rec["id"]] = (np.stack(joints18), boxes,
                                  (img_rec["height"], img_rec["width"]))

    call_state = {"img_id": None}

    def stub_get_outputs(multipliers, img, bucket=64, with_flip=False):
        joints, boxes, (h, w) = by_name[call_state["img_id"]]
        heat = make_heatmaps_np(joints, h, w, stride=1, sigma=2.0)
        flip_heat = None
        if with_flip:
            from multiposenet_tpu.data.augment import FLIP_ORDER_18
            j = joints.copy()
            j[:, :, 0] = w - 1 - j[:, :, 0]
            j = j[:, FLIP_ORDER_18, :]
            flip_heat = make_heatmaps_np(j, h, w, stride=1, sigma=2.0)
        return heat, [list(boxes) for _ in multipliers], flip_heat, None

    orig_run = ev._get_outputs
    ev._get_outputs = stub_get_outputs

    # wrap coco_eval's per-image loop: we need img_id visible to the stub
    real_loadimgs = COCOIndex.load_imgs

    def tracking_load_imgs(self, ids):
        out = real_loadimgs(self, ids)
        if isinstance(ids, int) and ids in by_name:
            call_state["img_id"] = ids
        return out

    COCOIndex.load_imgs = tracking_load_imgs
    try:
        metrics = ev.coco_eval(ann_file=ann_file, img_dir=img_dir)
    finally:
        COCOIndex.load_imgs = real_loadimgs
        ev._get_outputs = orig_run

    assert metrics, "no detections produced"
    assert metrics["AP"] > 0.99, metrics
    assert metrics["AR"] > 0.99, metrics


@pytest.mark.slow  # compile-heavy (tiering: docs/TESTING.md)
def test_keypoint_overfit_recovers_peaks():
    """Train the real keypoint subnet on one batch; the inference pipeline
    must find the planted joints afterwards."""
    from multiposenet_tpu.engine.train_steps import (
        create_train_state, make_keypoint_steps)
    from multiposenet_tpu.engine.inference import make_full_pipeline

    size = 96
    cfg = Config(model=ModelConfig(backbone="resnet50"),
                 data=DataConfig(inp_size=size))
    model = PoseNet(cfg.model)
    state, tx, mask = create_train_state(
        model, cfg, jax.random.PRNGKey(0), (size, size), "keypoint")
    train_step, _ = make_keypoint_steps(model, cfg, tx, mask)

    rng = np.random.RandomState(0)
    img = (rng.rand(2, size, size, 3) * 255).astype(np.uint8)
    joints = np.full((2, 1, 18, 3), 2.0, np.float32)
    planted = [(24, 32), (64, 56)]
    for b, (x, y) in enumerate(planted):
        joints[b, 0, :, 0] = x
        joints[b, 0, :, 1] = y
        joints[b, 0, :, 2] = 1.0
    batch = {"image": jnp.asarray(img), "joints": jnp.asarray(joints),
             "mask": jnp.ones((2, size // 4, size // 4), np.float32)}

    loss = None
    for i in range(80):
        state, logs = train_step(state, batch, jnp.asarray(3e-4))
        loss = float(logs["loss"])
    assert loss < 0.03, f"did not overfit: loss {loss}"

    pipe = make_full_pipeline(model, cfg, (size, size))
    out = pipe({"params": state.params, "batch_stats": state.batch_stats},
               jnp.asarray(img))
    coords = np.asarray(out.peaks.coords)
    scores = np.asarray(out.peaks.scores)
    for b, (x, y) in enumerate(planted):
        # strongest peak of each joint should be near the planted location
        for j in range(18):
            best = np.argmax(scores[b, j])
            px, py = coords[b, j, best]
            assert abs(px - x) <= 6 and abs(py - y) <= 6, (
                b, j, (px, py), (x, y))


def test_coco_eval_sharding_and_merge(synthetic_coco, tmp_path):
    """--eval-shard i:n must partition the image set; merged shard results
    must score identically to the unsharded run."""
    import json
    from multiposenet_tpu.engine.evaluator import Evaluator
    from multiposenet_tpu.eval.cocoeval import KeypointEval

    img_dir, ann_file, gt = synthetic_coco
    gt_idx = COCOIndex(dataset=gt)
    import dataclasses
    cfg = Config(model=ModelConfig(backbone="resnet50"),
                 data=DataConfig(inp_size=128))
    cfg = dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, device_resize=False))
    ev = Evaluator(cfg)
    # stub the per-image network+grouping: emit GT-derived persons so the
    # sharding/merge bookkeeping is isolated
    ev._get_outputs = lambda mult, img, bucket=64, with_flip=False: \
        (None, [[]], None, None)

    def finish(orig_heat, flip_heat, orig_bbox, img_h, name, img_id,
               peaks=None):
        out = []
        for ann in gt_idx.img_to_anns[img_id]:
            out.append({"image_id": img_id, "category_id": 1,
                        "keypoints": list(map(float, ann["keypoints"])),
                        "bbox": list(map(float, ann["bbox"])),
                        "score": 1.0})
        return out
    ev._finish_image = finish

    full_file = str(tmp_path / "full.json")
    metrics_full = ev.coco_eval(ann_file=ann_file, img_dir=img_dir,
                                result_file=full_file)
    assert metrics_full["AP"] > 0.99

    shard_files = []
    for i in range(2):
        sf = str(tmp_path / f"shard{i}.json")
        m = ev.coco_eval(ann_file=ann_file, img_dir=img_dir, result_file=sf,
                         shard=(i, 2), skip_metrics=True)
        assert m == {}  # shards don't score alone
        shard_files.append(sf)

    merged = []
    for sf in shard_files:
        with open(sf) as f:
            merged.extend(json.load(f))
    with open(full_file) as f:
        full = json.load(f)
    assert sorted(r["image_id"] for r in merged) == \
        sorted(r["image_id"] for r in full)

    dt = gt_idx.load_res(merged)
    ev2 = KeypointEval(gt_idx, dt, img_ids=gt_idx.get_img_ids(cat_ids=[1]))
    m2 = ev2.evaluate()
    assert abs(m2["AP"] - metrics_full["AP"]) < 1e-9


def test_coco_eval_device_path(synthetic_coco):
    """coco_eval through the pipelined DEVICE path: only the network forward
    is stubbed (GT-derived stride-4 heatmaps + boxes per scale).  Real:
    the fused on-device resize+sum+fold+peaks exec, the dispatch/fetch
    image pipelining (worker thread), device PRN grouping, COCO reorder,
    and the OKS evaluator."""
    import dataclasses
    import types
    from multiposenet_tpu.eval.multiscale import get_multipliers

    img_dir, ann_file, gt = synthetic_coco
    cfg = Config(model=ModelConfig(backbone="resnet50"),
                 data=DataConfig(inp_size=128))
    cfg = dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, inp_size=128,
                                      scale_search=(0.5, 1.0), flip=False,
                                      # the per-call-order stub below needs
                                      # per-image dispatches
                                      group_size=1))
    assert cfg.eval.device_resize and cfg.eval.device_peaks
    model = PoseNet(cfg.model)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, cfg.model.prn_height, cfg.model.prn_width, 17)),
        method=PoseNet.init_all)
    ev = Evaluator(cfg, model, variables)

    by_id = {}
    gt_idx = COCOIndex(dataset=gt)
    for img_rec in gt["images"]:
        joints18, boxes = [], []
        for ann in gt_idx.img_to_anns[img_rec["id"]]:
            j17 = np.asarray(ann["keypoints"], np.float64).reshape(17, 3)
            j17[:, 2] = np.where(j17[:, 2] == 2, 1.0, 2.0)
            joints18.append(add_neck(j17))
            b = ann["bbox"]
            boxes.append([b[0], b[1], b[0] + b[2], b[1] + b[3]])
        by_id[img_rec["id"]] = (np.stack(joints18), boxes,
                                (img_rec["height"], img_rec["width"]))

    call_state = {"img_id": None, "call": 0}

    def stub_pipeline(hw, with_peaks=True, with_detections=True):
        assert not with_peaks
        def run(params, batch):
            joints, boxes, (h, w) = by_id[call_state["img_id"]]
            mults = get_multipliers(h, cfg.eval.inp_size,
                                    cfg.eval.scale_search)
            m = mults[call_state["call"] % len(mults)]
            call_state["call"] += 1
            im_scale = (m * h) / min(h, w)
            bs = batch.shape[0]
            j = joints.copy()
            j[:, :, :2] *= im_scale   # joints in the resized (cropped) frame
            hm = make_heatmaps_np(j, hw[0] // 4, hw[1] // 4, stride=4,
                                  sigma=6.0)
            nb = len(boxes)
            bx = np.zeros((bs, nb, 4), np.float32)
            bx[:] = np.asarray(boxes, np.float32) * im_scale
            sc = np.full((bs, nb), 0.9, np.float32)
            return types.SimpleNamespace(
                heatmaps=jnp.asarray(np.repeat(hm[None], bs, 0)),
                detections=types.SimpleNamespace(
                    scores=jnp.asarray(sc), boxes=jnp.asarray(bx)))
        return run

    ev.pipeline = stub_pipeline

    real_loadimgs = COCOIndex.load_imgs

    def tracking_load_imgs(self, ids):
        out = real_loadimgs(self, ids)
        if isinstance(ids, int) and ids in by_id:
            call_state["img_id"] = ids
            call_state["call"] = 0
        return out

    COCOIndex.load_imgs = tracking_load_imgs
    try:
        metrics = ev.coco_eval(ann_file=ann_file, img_dir=img_dir)
    finally:
        COCOIndex.load_imgs = real_loadimgs

    assert metrics, "no detections produced"
    assert metrics["AP"] > 0.8, metrics


def test_coco_eval_grouped_matches_ungrouped(tmp_path):
    """coco_eval with group_size>1 (batched same-signature dispatches,
    padded partial-group flush) must produce the same results as the
    per-image device path.  Images are constant-valued so the stubbed
    network can identify each batch row by content; two images share one
    signature (a full group), a third has its own (a padded flush)."""
    import dataclasses
    import json
    import types
    from multiposenet_tpu.eval.multiscale import (crop_shape_only,
                                                  get_multipliers)

    root = str(tmp_path)
    specs = {1: (160, 224, 40), 2: (160, 224, 80), 3: (144, 208, 120)}
    imgs, anns = [], []
    for img_id, (h, w, val) in specs.items():
        cv2.imwrite(os.path.join(root, f"{img_id}.jpg"),
                    np.full((h, w, 3), val, np.uint8))
        imgs.append({"id": img_id, "height": h, "width": w,
                     "file_name": f"{img_id}.jpg"})
        kps = _person_kps(60, 70)
        bbox = _bbox_from_kps(kps)
        anns.append({"id": img_id, "image_id": img_id, "category_id": 1,
                     "iscrowd": 0, "num_keypoints": 17,
                     "area": bbox[2] * bbox[3], "bbox": bbox,
                     "keypoints": kps})
    gt = {"images": imgs, "categories": [{"id": 1, "name": "person"}],
          "annotations": anns}
    ann_file = os.path.join(root, "gt.json")
    with open(ann_file, "w") as f:
        json.dump(gt, f)

    # jpeg is lossy but constant images round-trip exactly; trust nothing
    by_val = {}
    for img_id, (h, w, val) in specs.items():
        got = cv2.imread(os.path.join(root, f"{img_id}.jpg"))
        assert int(got[0, 0, 0]) == val, "constant image did not round-trip"
        by_val[val] = img_id

    gt_idx = COCOIndex(dataset=gt)
    by_id = {}
    for img_id, (h, w, _) in specs.items():
        ann = gt_idx.img_to_anns[img_id][0]
        j17 = np.asarray(ann["keypoints"], np.float64).reshape(17, 3)
        j17[:, 2] = np.where(j17[:, 2] == 2, 1.0, 2.0)
        b = ann["bbox"]
        by_id[img_id] = (np.stack([add_neck(j17)]),
                         [[b[0], b[1], b[0] + b[2], b[1] + b[3]]], (h, w))

    def make_ev(group_size):
        cfg = Config(model=ModelConfig(backbone="resnet50"),
                     data=DataConfig(inp_size=128))
        cfg = dataclasses.replace(
            cfg, eval=dataclasses.replace(cfg.eval, inp_size=128,
                                          scale_search=(0.5, 1.0),
                                          flip=False,
                                          group_size=group_size))
        model = PoseNet(cfg.model)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
            jnp.zeros((1, cfg.model.prn_height, cfg.model.prn_width, 17)),
            method=PoseNet.init_all)
        ev = Evaluator(cfg, model, variables)

        def stub_pipeline(hw, with_peaks=True, with_detections=True):
            assert not with_peaks

            def run(params, batch):
                batch = np.asarray(batch)
                hms, scs, bxs = [], [], []
                for row in batch:
                    img_id = by_val[int(row[0, 0, 0])]
                    joints, boxes, (h, w) = by_id[img_id]
                    m = next(m for m in get_multipliers(h, 128, (0.5, 1.0))
                             if crop_shape_only((h, w), m * h, factor=32,
                                                bucket=64)[0] == tuple(hw))
                    im_scale = (m * h) / min(h, w)
                    j = joints.copy()
                    j[:, :, :2] *= im_scale
                    hms.append(make_heatmaps_np(j, hw[0] // 4, hw[1] // 4,
                                                stride=4, sigma=6.0))
                    bxs.append(np.asarray(boxes, np.float32) * im_scale)
                    scs.append(np.full((len(boxes),), 0.9, np.float32))
                return types.SimpleNamespace(
                    heatmaps=jnp.asarray(np.stack(hms)),
                    detections=types.SimpleNamespace(
                        scores=jnp.asarray(np.stack(scs)),
                        boxes=jnp.asarray(np.stack(bxs))))
            return run
        ev.pipeline = stub_pipeline
        return ev

    res_g = os.path.join(root, "grouped.json")
    res_s = os.path.join(root, "single.json")
    m_g = make_ev(2).coco_eval(ann_file=ann_file, img_dir=root,
                               result_file=res_g)
    m_s = make_ev(1).coco_eval(ann_file=ann_file, img_dir=root,
                               result_file=res_s)
    assert m_g["AP"] > 0.8, m_g
    assert abs(m_g["AP"] - m_s["AP"]) < 1e-9

    with open(res_g) as f:
        rg = sorted(json.load(f), key=lambda r: r["image_id"])
    with open(res_s) as f:
        rs = sorted(json.load(f), key=lambda r: r["image_id"])
    assert [r["image_id"] for r in rg] == [r["image_id"] for r in rs]
    for a, b in zip(rg, rs):
        np.testing.assert_allclose(a["keypoints"], b["keypoints"], atol=1e-5)
        np.testing.assert_allclose(a["score"], b["score"], atol=1e-6)


def test_coco_eval_group_bookkeeping_fuzz(tmp_path):
    """Property: with grouped dispatch over RANDOM image-size mixes, every
    image is finished exactly once — regardless of how signatures
    interleave, how partial groups flush, or how much replication padding
    is added.  Device work is stubbed; the grouping/flush/pipelining
    bookkeeping is real."""
    import dataclasses
    import json
    import types

    rng = np.random.RandomState(7)
    sizes = [(96, 128), (96, 144), (112, 128), (128, 160)]
    n_img = 17   # odd count: forces partial-group flushes
    imgs, anns = [], []
    for i in range(1, n_img + 1):
        h, w = sizes[rng.randint(len(sizes))]
        cv2.imwrite(os.path.join(str(tmp_path), f"{i}.png"),
                    np.full((h, w, 3), 100, np.uint8))
        imgs.append({"id": i, "height": h, "width": w,
                     "file_name": f"{i}.png"})
        anns.append({"id": i, "image_id": i, "category_id": 1, "iscrowd": 0,
                     "num_keypoints": 17, "area": 100.0,
                     "bbox": [5, 5, 20, 20],
                     "keypoints": [10, 10, 2] * 17})
    ann_file = os.path.join(str(tmp_path), "gt.json")
    with open(ann_file, "w") as f:
        json.dump({"images": imgs, "annotations": anns,
                   "categories": [{"id": 1, "name": "person"}]}, f)

    for gs in (2, 3, 5):
        cfg = Config(model=ModelConfig(backbone="resnet50"),
                     data=DataConfig(inp_size=64))
        cfg = dataclasses.replace(
            cfg, eval=dataclasses.replace(cfg.eval, inp_size=64,
                                          scale_search=(0.5, 1.0),
                                          flip=False, group_size=gs))
        ev = Evaluator(cfg)
        assert ev._use_groups()

        def dispatch(imgs_list, bucket, with_flip):
            return [img.shape[:2] for img in imgs_list]

        def fetch(handle):
            return [(None, [[]], None,
                     (np.zeros((17, 2, 2), np.float32),
                      np.full((17, 2), -1.0, np.float32),
                      np.zeros((17, 2), bool))) for _ in handle]

        ev._dispatch_group_device = dispatch
        ev._fetch_group_device = fetch
        finished = []
        ev._finish_image = lambda *a, **k: (
            finished.append(a[5]) or
            [{"image_id": a[5], "category_id": 1,
              "keypoints": [1.0] * 51, "bbox": [0, 0, 1, 1],
              "score": 1.0}])
        metrics = ev.coco_eval(ann_file=ann_file, img_dir=str(tmp_path))
        assert sorted(finished) == list(range(1, n_img + 1)), (gs, finished)
        assert metrics  # scored without error
