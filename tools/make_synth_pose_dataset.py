"""Generate a LEARNABLE synthetic pose dataset in the exact on-disk layout
the CLI consumes for all three training stages and for coco-eval.

Stick figures with globally-fixed per-joint colors (a strong visual cue a
convnet can learn quickly) over smooth random backgrounds.  Skeleton
proportions are human-plausible so the PRN sees realistic joint layouts.

Layout produced under --root:
  COCO.json                                   keypoint index (CMU/Realtime-
                                              Multi-Person schema; one record
                                              per person, reference
                                              training/train_pose.py expects
                                              the same file)
  images/COCO_{train,val}2014_XXXXXXXXXXXX.jpg   keypoint-stage images
  mask2014/{train,val}2014_mask_miss_XXX.png     all-valid miss masks
  annotations/person_keypoints_{train,val}2017.json  standard COCO jsons
  {train2017,val2017}/XXXXXXXXXXXX.jpg           detection-stage images
  images/val2017/XXXXXXXXXXXX.jpg                coco-eval images

The same underlying image is hard-linked into every view so the three
stages and the evaluator see consistent pixels.

Usage:  python tools/make_synth_pose_dataset.py --root /tmp/mpn_synth_coco \
            --n-train 320 --n-val 48 [--seed 0]
"""
import argparse
import json
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# COCO keypoint order (annotation category spec)
KEYPOINT_NAMES = [
    "nose", "left_eye", "right_eye", "left_ear", "right_ear",
    "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
    "left_wrist", "right_wrist", "left_hip", "right_hip",
    "left_knee", "right_knee", "left_ankle", "right_ankle",
]
# COCO category skeleton (1-indexed pairs)
SKELETON = [
    [16, 14], [14, 12], [17, 15], [15, 13], [12, 13], [6, 12], [7, 13],
    [6, 7], [6, 8], [7, 9], [8, 10], [9, 11], [2, 3], [1, 2], [1, 3],
    [2, 4], [3, 5], [4, 6], [5, 7],
]
# one fixed, saturated BGR color per joint — the learnable cue
JOINT_COLORS = [
    (0, 0, 255), (0, 128, 255), (0, 255, 255), (0, 255, 128), (0, 255, 0),
    (128, 255, 0), (255, 255, 0), (255, 128, 0), (255, 0, 0), (255, 0, 128),
    (255, 0, 255), (128, 0, 255), (64, 64, 255), (64, 255, 64),
    (255, 64, 64), (192, 128, 0), (0, 128, 192),
]

# canonical standing skeleton: (x, y) in units of body height, y down from
# the top of the head
CANON = {
    "nose": (0.00, 0.06),
    "left_eye": (0.03, 0.04), "right_eye": (-0.03, 0.04),
    "left_ear": (0.055, 0.06), "right_ear": (-0.055, 0.06),
    "left_shoulder": (0.11, 0.18), "right_shoulder": (-0.11, 0.18),
    "left_elbow": (0.17, 0.33), "right_elbow": (-0.17, 0.33),
    "left_wrist": (0.20, 0.47), "right_wrist": (-0.20, 0.47),
    "left_hip": (0.07, 0.52), "right_hip": (-0.07, 0.52),
    "left_knee": (0.09, 0.73), "right_knee": (-0.09, 0.73),
    "left_ankle": (0.09, 0.95), "right_ankle": (-0.09, 0.95),
}


def sample_person(rng, w, h, h_range=None):
    """Random plausible figure fully inside the frame: (17,3) float array.
    `h_range` overrides the body-height range (crowd scenes use smaller,
    overlapping figures)."""
    h_max = min(360.0, h - 24.0)          # body height ~= vertical span
    if h_range is not None:
        # clamp BOTH bounds to the frame: for small frames h_max can fall
        # below h_range[0] and a reversed uniform interval is undefined
        hi_b = min(h_range[1], h_max)
        H = rng.uniform(min(h_range[0], hi_b), hi_b)
    else:
        H = rng.uniform(min(150.0, 0.6 * h_max), h_max)
    theta = np.deg2rad(rng.uniform(-15, 15))
    c, s = np.cos(theta), np.sin(theta)
    pts = np.array([CANON[n] for n in KEYPOINT_NAMES], np.float64) * H
    # limb-pose variation: swing wrists/elbows/knees a little
    jitter = rng.uniform(-0.025, 0.025, size=(17, 2)) * H
    jitter[7:11] += rng.uniform(-0.05, 0.05, size=(4, 2)) * H  # arms
    pts = pts + jitter
    # rotate about the hip center
    hip = pts[11:13].mean(axis=0)
    pts = (pts - hip) @ np.array([[c, -s], [s, c]]).T + hip
    # place so all joints are >= 8 px inside
    lo, hi = pts.min(axis=0), pts.max(axis=0)
    span = hi - lo
    if span[0] > w - 16 or span[1] > h - 16:
        return None
    off = np.array([rng.uniform(8 - lo[0], w - 8 - hi[0]),
                    rng.uniform(8 - lo[1], h - 8 - hi[1])])
    pts = pts + off
    vis = np.full((17, 1), 2.0)
    vis[rng.random(17) < 0.08] = 1.0  # occasionally "labeled, not visible"
    return np.concatenate([pts, vis], axis=1), H


def draw_person(img, kp, H, rng):
    limb_color = tuple(int(v) for v in rng.integers(60, 140, 3))
    t = max(2, int(H / 36))
    for a, b in SKELETON:
        pa = tuple(np.round(kp[a - 1, :2]).astype(int))
        pb = tuple(np.round(kp[b - 1, :2]).astype(int))
        cv2.line(img, pa, pb, limb_color, t, cv2.LINE_AA)
    head = kp[0, :2]  # nose
    cv2.circle(img, tuple(np.round(head).astype(int)), max(3, int(H * 0.055)),
               limb_color, -1, cv2.LINE_AA)
    r = max(2, int(H / 45))
    for j in range(17):
        cv2.circle(img, tuple(np.round(kp[j, :2]).astype(int)), r,
                   JOINT_COLORS[j], -1, cv2.LINE_AA)


def background(rng, w, h):
    """Smooth random gradient + mild noise."""
    g = rng.uniform(30, 225, size=(4, 4, 3))
    bg = cv2.resize(g.astype(np.float32), (w, h), interpolation=cv2.INTER_CUBIC)
    bg += rng.normal(0, 6, size=bg.shape)
    return np.clip(bg, 0, 255).astype(np.uint8)


def person_ann(kp, img_id, ann_id):
    xy = kp[:, :2]
    x0, y0 = xy.min(axis=0) - 4
    x1, y1 = xy.max(axis=0) + 4
    bbox = [float(x0), float(y0), float(x1 - x0), float(y1 - y0)]
    flat = []
    for j in range(17):
        flat += [float(kp[j, 0]), float(kp[j, 1]), int(kp[j, 2])]
    return {
        "id": ann_id, "image_id": img_id, "category_id": 1,
        "iscrowd": 0, "num_keypoints": int((kp[:, 2] > 0).sum()),
        "keypoints": flat, "bbox": bbox,
        "area": float(bbox[2] * bbox[3]),
        "segmentation": [[bbox[0], bbox[1], bbox[0] + bbox[2], bbox[1],
                          bbox[0] + bbox[2], bbox[1] + bbox[3],
                          bbox[0], bbox[1] + bbox[3]]],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--n-train", type=int, default=320)
    ap.add_argument("--n-val", type=int, default=48)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--crowd-frac", type=float, default=0.25,
                    help="fraction of images drawn as CROWDS (6-10 small "
                         "overlapping figures) — exercises the PRN "
                         "mutual-best contention, the fallback branch and "
                         "the evaluator's crowd-capacity escalation")
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    w, h = args.width, args.height
    root = args.root
    for d in ("images", "mask2014", "annotations", "train2017", "val2017",
              "images/val2017"):
        os.makedirs(os.path.join(root, d), exist_ok=True)

    records = []
    coco = {"train2017": {"images": [], "annotations": []},
            "val2017": {"images": [], "annotations": []}}
    ann_id = 1
    for i in range(args.n_train + args.n_val):
        is_val = i >= args.n_train
        split, tag = ("val2017", "val") if is_val else ("train2017", "train")
        img = background(rng, w, h)
        people = []
        is_crowd = rng.random() < args.crowd_frac
        if is_crowd:
            n_want = int(rng.integers(6, 11))
            h_range = (55.0, 140.0)
        else:
            n_want = int(rng.integers(1, 4))
            h_range = None
        for _ in range(n_want):
            p = sample_person(rng, w, h, h_range=h_range)
            if p is not None:
                people.append(p)
        retry = np.random.default_rng(args.seed + i)
        while not people:
            p = sample_person(retry, w, h, h_range=h_range)
            if p is not None:
                people.append(p)
        for kp, H in people:
            draw_person(img, kp, H, rng)

        stem = f"{i:012d}"
        kp_name = f"COCO_{tag}2014_{stem}.jpg"
        kp_path = os.path.join(root, "images", kp_name)
        cv2.imwrite(kp_path, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
        cv2.imwrite(os.path.join(root, "mask2014",
                                 f"{tag}2014_mask_miss_{stem}.png"),
                    np.full((h, w), 255, np.uint8))
        det_name = f"{stem}.jpg"
        for link in ([os.path.join(root, split, det_name)] +
                     ([os.path.join(root, "images/val2017", det_name)]
                      if is_val else [])):
            if os.path.exists(link):
                os.remove(link)
            os.link(kp_path, link)

        coco[split]["images"].append(
            {"id": i, "file_name": det_name, "width": w, "height": h})
        for kp, _ in people:
            coco[split]["annotations"].append(person_ann(kp, i, ann_id))
            ann_id += 1

        # one keypoint record per person (CMU preprocessing convention).
        # NOTE visibility flips convention here: the CMU COCO.json encodes
        # 1 = labeled+visible, 0 = labeled+occluded, 2 = NOT labeled
        # (reference COCO_data_pipeline.py:137-151 treats v==2 as missing;
        # heatmap targets draw iff v <= 1), while the standard COCO
        # annotations above keep 2 = visible, 1 = occluded, 0 = unlabeled.
        def to_cmu(kp):
            out = kp.copy()
            out[:, 2] = np.where(kp[:, 2] == 2.0, 1.0,
                                 np.where(kp[:, 2] == 1.0, 0.0, 2.0))
            return out

        for pi, (kp, H) in enumerate(people):
            others = [to_cmu(people[q][0])
                      for q in range(len(people)) if q != pi]
            xy = kp[:, :2]
            center = (xy.min(axis=0) + xy.max(axis=0)) / 2.0
            records.append({
                "dataset": "COCO_val" if is_val else "COCO",
                "isValidation": 1.0 if is_val else 0.0,
                "img_paths": kp_name,
                "img_width": float(w), "img_height": float(h),
                "image_id": i,
                "objpos": [float(center[0]), float(center[1])],
                "scale_provided": float(H / 368.0),
                "joint_self": to_cmu(kp).tolist(),
                "joint_others": [o.tolist() for o in others],
                "numOtherPeople": float(len(others)),
            })

    with open(os.path.join(root, "COCO.json"), "w") as f:
        json.dump({"root": records}, f)
    cat = {"id": 1, "name": "person", "supercategory": "person",
           "keypoints": KEYPOINT_NAMES, "skeleton": SKELETON}
    for split in ("train2017", "val2017"):
        with open(os.path.join(root, "annotations",
                               f"person_keypoints_{split}.json"), "w") as f:
            json.dump({"images": coco[split]["images"],
                       "annotations": coco[split]["annotations"],
                       "categories": [cat]}, f)
    n_img = args.n_train + args.n_val
    print(f"wrote {n_img} images, {len(records)} keypoint records, "
          f"{ann_id - 1} annotations under {root}")


if __name__ == "__main__":
    main()
