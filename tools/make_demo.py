"""Generate demo artifacts from a REAL end-to-end run of the framework.

The reference checks expected demo renders into demo/output/ (reference
evaluate/multipose_test.py writes *_1heatmap.png / *_2canvas.png,
tester.py:247-250).  The environment has no COCO images or pretrained
checkpoint, so this script manufactures the full experience on synthetic
stick-figure scenes:

  1. draws multi-person scenes with a known 18-joint skeleton layout
  2. stage-trains the real model on them: keypoint subnet (backbone + head),
     then detection subnet (RetinaNet heads, trunk frozen — the reference's
     staged recipe, multipose_detection_train.py)
  3. runs the REAL demo path (Evaluator.test: fused pipeline -> peaks ->
     boxes -> PRN grouping -> renderer) over held-out jittered scenes and
     writes demo/test_images + demo/output

Run:  python tools/make_demo.py [--steps N] [--size 128] [--out demo]
"""

import argparse
import dataclasses
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 18-joint internal order (reference COCO_data_pipeline.py:123-174):
# nose neck Rsho Relb Rwri Lsho Lelb Lwri Rhip Rkne Rank Lhip Lkne Lank
# Reye Leye Rear Lear — template in unit coords (x, y)
TEMPLATE_18 = np.array([
    [0.50, 0.10], [0.50, 0.25],
    [0.35, 0.25], [0.28, 0.45], [0.25, 0.62],
    [0.65, 0.25], [0.72, 0.45], [0.75, 0.62],
    [0.40, 0.55], [0.38, 0.75], [0.36, 0.95],
    [0.60, 0.55], [0.62, 0.75], [0.64, 0.95],
    [0.45, 0.06], [0.55, 0.06], [0.40, 0.09], [0.60, 0.09]], np.float32)
LIMBS_18 = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6), (6, 7),
            (1, 8), (8, 9), (9, 10), (1, 11), (11, 12), (12, 13),
            (0, 14), (0, 15), (14, 16), (15, 17)]
LIMB_COLORS = [(200, 60, 40), (40, 160, 220), (60, 200, 80), (230, 180, 40),
               (180, 60, 200)]


def draw_scene(size, persons, rng):
    """persons: list of (cx, top_y, height) in pixels.  Returns (img_bgr u8,
    joints (P, 18, 3) with v=1, boxes (P, 4) xyxy)."""
    img = (rng.rand(size, size, 3) * 40 + 200).astype(np.uint8)
    joints, boxes = [], []
    for pi, (cx, ty, h) in enumerate(persons):
        w = h * 0.55
        j = TEMPLATE_18.copy()
        j[:, 0] = (j[:, 0] - 0.5) * w + cx
        j[:, 1] = j[:, 1] * h + ty
        j += rng.randn(18, 2) * 0.8
        col = LIMB_COLORS[pi % len(LIMB_COLORS)]
        for a, b in LIMBS_18:
            cv2.line(img, tuple(j[a].astype(int)), tuple(j[b].astype(int)),
                     col, 3)
        for t in range(18):
            cv2.circle(img, tuple(j[t].astype(int)), 2,
                       (int(col[2]), int(col[0]), int(col[1])), -1)
        joints.append(np.concatenate([j, np.ones((18, 1), np.float32)], 1))
        x1, y1 = j.min(0) - 4
        x2, y2 = j.max(0) + 4
        boxes.append([x1, y1, x2, y2])
    return img, np.stack(joints), np.asarray(boxes, np.float32)


def scene_batch(size, n, rng, max_p=2):
    imgs, joints = [], []
    for _ in range(n):
        pers = [(size * 0.28 + rng.randn() * 3, size * 0.08 + rng.randn() * 3,
                 size * 0.72),
                (size * 0.72 + rng.randn() * 3, size * 0.25 + rng.randn() * 3,
                 size * 0.55)]
        im, jt, _ = draw_scene(size, pers, rng)
        imgs.append(im[:, :, ::-1])  # train pipeline takes RGB
        jpad = np.full((max_p, 18, 3), 2.0, np.float32)
        jpad[:len(jt)] = jt
        joints.append(jpad)
    return np.stack(imgs), np.stack(joints).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--det-steps", type=int, default=None)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--det-lr", type=float, default=1e-4)
    ap.add_argument("--out", default="demo")
    ap.add_argument("--cpu", action="store_true", help="force 1-device CPU")
    ap.add_argument("--diag", action="store_true",
                    help="print heatmap/detector stats on a TRAIN scene")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from multiposenet_tpu.config import Config, ModelConfig, DataConfig
    from multiposenet_tpu.engine.evaluator import Evaluator
    from multiposenet_tpu.engine.train_steps import (
        STEP_FACTORIES, create_train_state)
    from multiposenet_tpu.models.posenet import PoseNet
    from multiposenet_tpu.utils.logging import logger

    size = args.size
    cfg = Config(model=ModelConfig(backbone="resnet50"),
                 data=DataConfig(inp_size=size))
    cfg = dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, inp_size=size,
                                      write_image=True, write_json=True))
    model = PoseNet(cfg.model)

    rng = np.random.RandomState(7)
    imgs, joints = scene_batch(size, 4, rng)
    mask = np.ones((4, size // 4, size // 4), np.float32)
    kp_batch = {"image": jnp.asarray(imgs), "joints": jnp.asarray(joints),
                "mask": jnp.asarray(mask)}

    # ---- stage 1: keypoint subnet -------------------------------------
    state, tx, fmask = create_train_state(
        model, cfg, jax.random.PRNGKey(0), (size, size), "keypoint")
    train_step, _ = STEP_FACTORIES["keypoint"](model, cfg, tx, fmask)
    lr = jnp.asarray(args.lr)
    for i in range(args.steps):
        state, logs = train_step(state, kp_batch, lr)
        if i % 500 == 0 or i == args.steps - 1:
            logger.info("keypoint step %d loss %.5f max_ht %.3f", i,
                        float(logs["loss"]), float(logs["max_ht"]))

    # ---- stage 2: detection heads (trunk frozen, staged recipe) -------
    boxes = np.full((4, 4, 5), -1.0, np.float32)
    for b in range(4):
        for p in range(2):
            j = joints[b, p, :, :2]
            boxes[b, p] = [j[:, 0].min() - 4, j[:, 1].min() - 4,
                           j[:, 0].max() + 4, j[:, 1].max() + 4, 0]
    det_batch = {"image": jnp.asarray(imgs), "boxes": jnp.asarray(boxes)}

    dstate, dtx, dmask = create_train_state(
        model, cfg, jax.random.PRNGKey(1), (size, size), "detection")
    dstate = dstate.replace(params=state.params,
                            batch_stats=state.batch_stats)
    dtrain, _ = STEP_FACTORIES["detection"](model, cfg, dtx, dmask,
                                            image_hw=(size, size))
    dlr = jnp.asarray(args.det_lr)
    for i in range(args.det_steps or args.steps):
        dstate, logs = dtrain(dstate, det_batch, dlr)
        if i % 500 == 0 or i == (args.det_steps or args.steps) - 1:
            logger.info("detection step %d loss %.5f", i, float(logs["loss"]))

    # ---- stage 3: PRN (reference multipose_prn_train.py recipe) --------
    gh, gw = cfg.model.prn_height, cfg.model.prn_width
    thr = cfg.prn.in_thres
    weights_l, labels_l = [], []
    for b in range(4):
        # internal 17-joint order = 18-joint order minus the neck (row 1)
        persons17 = [np.delete(joints[b, p, :, :2], 1, axis=0)
                     for p in range(2)]
        for p in range(2):
            j = joints[b, p]
            x1, y1 = j[:, 0].min() - 4, j[:, 1].min() - 4
            bw = j[:, 0].max() + 4 - x1
            bh = j[:, 1].max() + 4 - y1
            xs, ys = gw / np.ceil(bw), gh / np.ceil(bh)
            weights = np.zeros((gh, gw, 17), np.float32)
            label = np.zeros((gh, gw, 17), np.float32)
            for q, pj in enumerate(persons17):
                for t in range(17):
                    kx, ky = pj[t]
                    if (x1 - bw * thr < kx < x1 + bw * (1 + thr)
                            and y1 - bh * thr < ky < y1 + bh * (1 + thr)):
                        gx = min(max(int((kx - x1) * xs), 0), gw - 1)
                        gy = min(max(int((ky - y1) * ys), 0), gh - 1)
                        weights[gy, gx, t] = 1.0
                        if q == p:
                            label[gy, gx, t] = 1.0
            weights_l.append(weights)
            labels_l.append(label)
    prn_batch = {"weights_marks": jnp.asarray(np.stack(weights_l)),
                 "label_marks": jnp.asarray(np.stack(labels_l))}

    pstate, ptx, pmask = create_train_state(
        model, cfg, jax.random.PRNGKey(2), (size, size), "prn")
    pstate = pstate.replace(params=dstate.params,
                            batch_stats=dstate.batch_stats)
    ptrain, _ = STEP_FACTORIES["prn"](model, cfg, ptx, pmask)
    prng = jax.random.PRNGKey(3)
    plr = jnp.asarray(1e-3)  # reference PRN lr (multipose_prn_train.py:79)
    for i in range(args.det_steps or args.steps):
        prng, sub = jax.random.split(prng)
        pstate, logs = ptrain(pstate, prn_batch, plr, sub)
        if i % 500 == 0 or i == (args.det_steps or args.steps) - 1:
            logger.info("prn step %d loss %.5f", i, float(logs["loss"]))

    variables = {"params": pstate.params, "batch_stats": pstate.batch_stats}

    if args.diag:
        from multiposenet_tpu.engine.inference import make_full_pipeline
        pipe = make_full_pipeline(model, cfg, (size, size))
        out = pipe(variables, jnp.asarray(imgs[:1]))
        hm = np.asarray(out.heatmaps)[0]
        ds = np.sort(np.asarray(out.detections.scores)[0])[::-1]
        pv = np.asarray(out.peaks.valid)[0]
        logger.info("DIAG train scene: heatmap max %.3f per-joint max %s",
                    hm.max(), np.round(hm.max((0, 1))[:8], 2))
        logger.info("DIAG top det scores %s; peaks/joint %s",
                    np.round(ds[:6], 3), pv.sum(1)[:8])

    # ---- demo inference over held-out scenes --------------------------
    test_dir = os.path.join(args.out, "test_images")
    out_dir = os.path.join(args.out, "output")
    os.makedirs(test_dir, exist_ok=True)
    rng2 = np.random.RandomState(99)
    for k in range(2):
        im, _, _ = draw_scene(size, [(size * 0.28, size * 0.08, size * 0.72),
                                     (size * 0.72, size * 0.25, size * 0.55)],
                              rng2)
        cv2.imwrite(os.path.join(test_dir, f"scene{k + 1}.png"), im)

    ev = Evaluator(cfg, model, variables)
    results = ev.test(test_dir, out_dir)
    logger.info("demo: %d person instances across %d scenes",
                len(results), 2)
    print(f"wrote {test_dir} and {out_dir}; {len(results)} persons detected")


if __name__ == "__main__":
    main()
