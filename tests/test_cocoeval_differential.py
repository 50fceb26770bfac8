"""Differential fuzz: eval/cocoeval.py vs an independent brute-force twin.

pycocotools is not installed here, so the OKS scorer cannot be compared
against the tool that produced BASELINE.md's table.  The next-best
adversarial check is a SECOND, independently written implementation of the
published COCO keypoints protocol (https://cocodataset.org/#keypoints-eval
+ the pycocotools reference semantics) with deliberately different
structure:

- matching: two explicit passes per detection (best available NON-ignored
  gt by OKS, else best available ignored gt) instead of the single ordered
  scan with a break;
- interpolated precision: direct max-over-recall-suffix definition
  p(r) = max{prec[i] : recall[i] >= r} instead of the monotone-stack +
  searchsorted formulation;
- OKS: recomputed from the formula, not shared with the implementation
  under test.

Scores/coordinates are drawn continuously so order ties (the one place
where implementations may legitimately diverge) have probability zero.
Every one of the 10 summary statistics must agree to 1e-9 on randomized
datasets exercising: crowd gts, zero-keypoint gts, area-bucket ignores on
both gt and dt side, maxDets truncation, empty images, unmatched garbage
detections, and the no-labeled-keypoints expanded-bbox OKS branch.
"""

import numpy as np
import pytest

from multiposenet_tpu.data.coco_json import COCOIndex
from multiposenet_tpu.eval.cocoeval import (
    AREA_RNGS, IOU_THRS, KPT_SIGMAS, MAX_DETS, REC_THRS, KeypointEval)


# --------------------------------------------------------------------------
# independent twin
# --------------------------------------------------------------------------

def _oks_twin(dt_kps, gt):
    """OKS from the protocol definition (independent of eval/cocoeval.py)."""
    g = np.asarray(gt["keypoints"], np.float64).reshape(17, 3)
    d = np.asarray(dt_kps, np.float64).reshape(17, 3)
    s2 = float(gt["area"]) + np.spacing(1)
    kappa2 = (2.0 * KPT_SIGMAS) ** 2
    labeled = g[:, 2] > 0
    if labeled.any():
        d2 = (d[:, 0] - g[:, 0]) ** 2 + (d[:, 1] - g[:, 1]) ** 2
        e = d2 / (2.0 * s2 * kappa2)
        e = e[labeled]
    else:
        # no labeled joints: distance to the bbox expanded by its own size
        x, y, w, h = gt["bbox"]
        dx = np.clip((x - w) - d[:, 0], 0, None) + \
            np.clip(d[:, 0] - (x + 2 * w), 0, None)
        dy = np.clip((y - h) - d[:, 1], 0, None) + \
            np.clip(d[:, 1] - (y + 2 * h), 0, None)
        e = (dx ** 2 + dy ** 2) / (2.0 * s2 * kappa2)
    return float(np.mean(np.exp(-e)))


def _gt_is_ignored(g, lo, hi):
    return bool(g.get("ignore", 0) or g.get("iscrowd", 0)
                or g.get("num_keypoints", 0) == 0
                or not (lo <= g["area"] <= hi))


def _eval_twin(gt_index, dt_index, img_ids):
    """Full protocol, brute force.  Returns the same 10-stat dict."""
    out = {}
    for area_name, (lo, hi) in AREA_RNGS.items():
        # flat per-detection rows across all images: (score, matched, ignored)
        rows = []          # filled image-major (same as the impl under test)
        npig = 0
        any_img = False
        for img_id in img_ids:
            gts = [g for g in gt_index.img_to_anns.get(img_id, [])
                   if g.get("category_id", 1) == 1]
            dts = [d for d in dt_index.img_to_anns.get(img_id, [])
                   if d.get("category_id", 1) == 1]
            if not gts and not dts:
                continue
            any_img = True
            gt_ign = [_gt_is_ignored(g, lo, hi) for g in gts]
            npig += sum(1 for i in gt_ign if not i)
            dts = sorted(dts, key=lambda d: -d["score"])[:MAX_DETS]
            oks = np.array([[_oks_twin(d["keypoints"], g) for g in gts]
                            for d in dts]) if gts else np.zeros((len(dts), 0))

            per_thr = []  # per threshold: list of (matched, to_ignored)
            for t in IOU_THRS:
                taken = [False] * len(gts)
                res = []
                for di in range(len(dts)):
                    pick = -1
                    # pass 1: best available non-ignored gt at OKS >= t
                    best = min(t, 1 - 1e-10)
                    for gi in range(len(gts)):
                        if taken[gi] or gt_ign[gi]:
                            continue
                        if oks[di, gi] > best:
                            best, pick = oks[di, gi], gi
                    if pick == -1:
                        # pass 2: best available ignored gt
                        best = min(t, 1 - 1e-10)
                        for gi in range(len(gts)):
                            if taken[gi] or not gt_ign[gi]:
                                continue
                            if oks[di, gi] > best:
                                best, pick = oks[di, gi], gi
                    if pick >= 0:
                        taken[pick] = True
                        res.append((True, gt_ign[pick]))
                    else:
                        res.append((False, False))
                per_thr.append(res)

            for di, d in enumerate(dts):
                area = d.get("area", d["bbox"][2] * d["bbox"][3])
                out_of_rng = area < lo or area > hi
                flags = []
                for ti in range(len(IOU_THRS)):
                    matched, to_ign = per_thr[ti][di]
                    ignored = to_ign or (not matched and out_of_rng)
                    flags.append((matched, ignored))
                rows.append((d["score"], flags))

        if not any_img or npig == 0:
            for k in _stat_keys(area_name):
                out[k] = -1.0
            continue

        rows.sort(key=lambda r: -r[0])  # continuous scores: no ties
        aps, ars = [], []
        for ti, thr in enumerate(IOU_THRS):
            tp = fp = 0
            prec, rec = [], []
            for _, flags in rows:
                matched, ignored = flags[ti]
                if ignored:
                    continue
                if matched:
                    tp += 1
                else:
                    fp += 1
                prec.append(tp / (tp + fp + np.spacing(1)))
                rec.append(tp / npig)
            # interpolated precision: p(r) = max precision at recall >= r
            q = []
            for r in REC_THRS:
                cand = [p for p, rc in zip(prec, rec) if rc >= r]
                q.append(max(cand) if cand else 0.0)
            aps.append((thr, float(np.mean(q))))
            ars.append((thr, rec[-1] if rec else 0.0))

        def _ap(thr=None):
            vals = [v for t, v in aps if thr is None or abs(t - thr) < 1e-9]
            return float(np.mean(vals))

        def _ar(thr=None):
            vals = [v for t, v in ars if thr is None or abs(t - thr) < 1e-9]
            return float(np.mean(vals))

        if area_name == "all":
            out.update(AP=_ap(), AP50=_ap(0.5), AP75=_ap(0.75),
                       AR=_ar(), AR50=_ar(0.5), AR75=_ar(0.75))
        else:
            out[f"AP_{area_name}"] = _ap()
            out[f"AR_{area_name}"] = _ar()
    return out


def _stat_keys(area_name):
    if area_name == "all":
        return ["AP", "AP50", "AP75", "AR", "AR50", "AR75"]
    return [f"AP_{area_name}", f"AR_{area_name}"]


# --------------------------------------------------------------------------
# randomized dataset generator
# --------------------------------------------------------------------------

def _random_case(seed):
    rng = np.random.RandomState(seed)
    imgs, gt_anns, dets = [], [], []
    aid = 1
    for img_id in range(1, 9):
        imgs.append({"id": img_id, "height": 400, "width": 400,
                     "file_name": f"{img_id}.jpg"})
        n_gt = rng.randint(0, 5)
        people = []
        for _ in range(n_gt):
            cx, cy = rng.uniform(40, 360, 2)
            # areas straddle the medium/large boundary (96^2 = 9216)
            area = float(rng.choice([rng.uniform(800, 9000),
                                     rng.uniform(9500, 40000)]))
            side = float(np.sqrt(area))
            n_lab = int(rng.choice([0, 3, 9, 17],
                                   p=[0.12, 0.18, 0.3, 0.4]))
            kps = np.zeros((17, 3))
            lab = rng.permutation(17)[:n_lab]
            kps[lab, 0] = cx + rng.uniform(-side / 2, side / 2, n_lab)
            kps[lab, 1] = cy + rng.uniform(-side / 2, side / 2, n_lab)
            kps[lab, 2] = rng.choice([1, 2], n_lab)
            ann = {"id": aid, "image_id": img_id, "category_id": 1,
                   "iscrowd": int(rng.rand() < 0.12),
                   "num_keypoints": n_lab, "area": area,
                   "bbox": [cx - side / 2, cy - side / 2, side, side],
                   "keypoints": kps.reshape(-1).tolist()}
            gt_anns.append(ann)
            people.append(ann)
            aid += 1

        # detections: perturbed copies (noise spans hit/miss OKS bands) +
        # garbage; some images get >MAX_DETS to exercise truncation.  On
        # even seeds true detections outrank garbage (high-AP regime); on
        # odd seeds scores are uniform (garbage-dominated low-AP regime).
        # Scores stay continuous either way -> no order ties.
        n_extra = rng.randint(0, 4) + (22 if rng.rand() < 0.2 else 0)
        hi_scores = seed % 2 == 0
        for ann in people:
            if rng.rand() < 0.25:
                continue  # missed person
            kp = np.array(ann["keypoints"]).reshape(17, 3).copy()
            noise = rng.choice([1.0, 6.0, 20.0, 60.0])
            kp[:, :2] += rng.randn(17, 2) * noise
            kp[:, 2] = 1
            w = ann["bbox"][2] * rng.uniform(0.4, 1.8)
            h = ann["bbox"][3] * rng.uniform(0.4, 1.8)
            score = rng.rand() * 0.5 + 0.5 if hi_scores else rng.rand()
            dets.append({"image_id": img_id, "category_id": 1,
                         "score": float(score),
                         "bbox": [ann["bbox"][0], ann["bbox"][1],
                                  float(w), float(h)],
                         "keypoints": kp.reshape(-1).tolist()})
        for _ in range(n_extra):
            kp = np.zeros((17, 3))
            kp[:, 0] = rng.uniform(0, 400, 17)
            kp[:, 1] = rng.uniform(0, 400, 17)
            kp[:, 2] = 1
            w, h = rng.uniform(10, 200, 2)
            score = rng.rand() * 0.5 if hi_scores else rng.rand()
            dets.append({"image_id": img_id, "category_id": 1,
                         "score": float(score),
                         "bbox": [float(rng.uniform(0, 300)),
                                  float(rng.uniform(0, 300)),
                                  float(w), float(h)],
                         "keypoints": kp.reshape(-1).tolist()})

    gt = COCOIndex(dataset={"images": imgs, "annotations": gt_anns,
                            "categories": [{"id": 1, "name": "person"}]})
    return gt, dets


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------

@pytest.mark.parametrize("seed", range(20))
def test_fuzz_all_ten_stats_match(seed):
    gt, dets = _random_case(seed)
    if not dets:
        pytest.skip("empty draw")
    dt = gt.load_res(dets)
    ev = KeypointEval(gt, dt)
    ours = ev.evaluate()
    twin = _eval_twin(gt, dt, ev.img_ids)
    assert set(twin) == set(ours)
    for k in sorted(ours):
        assert ours[k] == pytest.approx(twin[k], abs=1e-9), (seed, k)


def test_crowd_and_zero_kp_gts_only_ignored_bucket():
    """All-ignored gts -> npig 0 -> every stat -1 in both implementations."""
    rng = np.random.RandomState(0)
    imgs = [{"id": 1, "height": 400, "width": 400, "file_name": "1.jpg"}]
    anns = [{"id": 1, "image_id": 1, "category_id": 1, "iscrowd": 1,
             "num_keypoints": 17, "area": 3000.0, "bbox": [50, 50, 55, 55],
             "keypoints": rng.uniform(50, 100, 51).tolist()},
            {"id": 2, "image_id": 1, "category_id": 1, "iscrowd": 0,
             "num_keypoints": 0, "area": 3000.0, "bbox": [200, 200, 55, 55],
             "keypoints": [0.0] * 51}]
    gt = COCOIndex(dataset={"images": imgs, "annotations": anns,
                            "categories": [{"id": 1, "name": "person"}]})
    dets = [{"image_id": 1, "category_id": 1, "score": 0.9,
             "bbox": [50.0, 50.0, 55.0, 55.0],
             "keypoints": rng.uniform(50, 100, 51).tolist()}]
    dt = gt.load_res(dets)
    ev = KeypointEval(gt, dt)
    ours = ev.evaluate()
    twin = _eval_twin(gt, dt, ev.img_ids)
    for k in ours:
        assert ours[k] == pytest.approx(twin[k], abs=1e-9), k
        assert ours[k] == -1.0
