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

The TIE CONTRACT is pinned to pycocotools' exact semantics and fuzzed
explicitly (round-3; the round-2 fuzz drew continuous scores so ties had
probability zero, leaving the contract untested while the real pipeline
CAN emit tied scores — confidence-1 peak entries and all-v=0 fallback
rows):
- equal detection scores: mergesort-stable everywhere — per-image order is
  results-list insertion order, cross-image order is image-major in sorted
  img_id order (both implementations inherit this from stable sorts);
- equal OKS between gts: the LAST qualifying gt in ignored-last gt order
  wins (pycocotools' running-max scan updates on `>=`);
- crowd gts (iscrowd=1) absorb ANY number of detections — a matched crowd
  gt stays available (pycocotools: "if this gt already matched, and not a
  crowd, continue"), so extra detections in a crowd are ignored, not FPs;
- OKS exactly equal to min(thr, 1-1e-10) counts as a match.

`test_fuzz_all_ten_stats_match` keeps the continuous-score regime;
`test_fuzz_degenerate_ties` draws quantized (heavily tied) scores,
exact-duplicate detections, zero-area dt boxes, single-point all-v=0-style
keypoint rows, and multi-detection crowds.  Every one of the 10 summary
statistics must agree to 1e-9 on both regimes, which together exercise:
crowd gts, zero-keypoint gts, area-bucket ignores on both gt and dt side,
maxDets truncation, empty images, unmatched garbage detections, and the
no-labeled-keypoints expanded-bbox OKS branch.
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

            crowd = [int(g.get("iscrowd", 0)) for g in gts]
            per_thr = []  # per threshold: list of (matched, to_ignored)
            for t in IOU_THRS:
                taken = [False] * len(gts)
                res = []
                for di in range(len(dts)):
                    # tie contract (pycocotools running-max scan): a
                    # candidate qualifies at OKS >= min(t, 1-1e-10); on
                    # equal OKS the LATER gt (in ignored-last order, which
                    # within one ignore class is original order) wins —
                    # hence `>=` against the running best.  Crowd gts stay
                    # available after being matched.
                    def pick_from(want_ignored):
                        best, pick = min(t, 1 - 1e-10), -1
                        for gi in range(len(gts)):
                            if bool(gt_ign[gi]) != want_ignored:
                                continue
                            if taken[gi] and not crowd[gi]:
                                continue
                            if oks[di, gi] >= best:
                                best, pick = oks[di, gi], gi
                        return pick
                    # pass 1: non-ignored gts; pass 2: ignored gts
                    pick = pick_from(False)
                    if pick == -1:
                        pick = pick_from(True)
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


def _degenerate_case(seed):
    """Tie-heavy / degenerate draw: everything the real pipeline can emit
    that the continuous fuzz excludes by construction.

    - scores quantized to 0.1 steps (dense exact ties, incl. cross-image);
    - exact-duplicate detections (identical keypoints -> identical OKS
      against every gt: exercises the last-gt-wins + stable-order contract);
    - zero-area dt boxes (w=0: the all-v=0 fallback emits degenerate
      boxes);
    - single-point keypoint rows (all 17 joints on one pixel — the
      fallback's shape);
    - crowd gts with 0 labeled keypoints swarmed by several detections
      (expanded-bbox OKS = 1.0 for all of them -> crowd re-match rule
      decides FP vs ignored for every extra one).
    """
    rng = np.random.RandomState(10_000 + seed)
    imgs, gt_anns, dets = [], [], []
    aid = 1
    for img_id in range(1, 7):
        imgs.append({"id": img_id, "height": 400, "width": 400,
                     "file_name": f"{img_id}.jpg"})
        people = []
        for _ in range(rng.randint(0, 4)):
            cx, cy = rng.uniform(60, 340, 2)
            area = float(rng.choice([rng.uniform(800, 9000),
                                     rng.uniform(9500, 40000)]))
            side = float(np.sqrt(area))
            is_crowd = int(rng.rand() < 0.35)
            n_lab = 0 if is_crowd else int(rng.choice([0, 9, 17]))
            kps = np.zeros((17, 3))
            lab = rng.permutation(17)[:n_lab]
            kps[lab, 0] = cx + rng.uniform(-side / 2, side / 2, n_lab)
            kps[lab, 1] = cy + rng.uniform(-side / 2, side / 2, n_lab)
            kps[lab, 2] = rng.choice([1, 2], n_lab)
            ann = {"id": aid, "image_id": img_id, "category_id": 1,
                   "iscrowd": is_crowd, "num_keypoints": n_lab,
                   "area": area,
                   "bbox": [cx - side / 2, cy - side / 2, side, side],
                   "keypoints": kps.reshape(-1).tolist()}
            gt_anns.append(ann)
            people.append(ann)
            aid += 1

        def qscore():
            return float(rng.randint(1, 11)) / 10.0  # 0.1 .. 1.0 ties

        for ann in people:
            # several detections per gt; crowds get a swarm
            n_d = rng.randint(2, 5) if ann["iscrowd"] else rng.randint(0, 3)
            for _ in range(n_d):
                if rng.rand() < 0.4:
                    # single-point row inside the gt bbox (fallback shape)
                    x = ann["bbox"][0] + rng.uniform(0, ann["bbox"][2])
                    y = ann["bbox"][1] + rng.uniform(0, ann["bbox"][3])
                    kp = np.tile([x, y, 1.0], 17).reshape(17, 3)
                    bw = 0.0 if rng.rand() < 0.5 else rng.uniform(5, 50)
                    bh = rng.uniform(5, 50)
                else:
                    kp = np.array(ann["keypoints"]).reshape(17, 3).copy()
                    kp[:, :2] += rng.randn(17, 2) * rng.choice([2.0, 25.0])
                    kp[:, 2] = 1
                    bw = ann["bbox"][2] * rng.uniform(0.5, 1.5)
                    bh = ann["bbox"][3] * rng.uniform(0.5, 1.5)
                d = {"image_id": img_id, "category_id": 1,
                     "score": qscore(),
                     "bbox": [float(ann["bbox"][0]), float(ann["bbox"][1]),
                              float(bw), float(bh)],
                     "keypoints": kp.reshape(-1).tolist()}
                dets.append(d)
                if rng.rand() < 0.3:
                    # exact duplicate (same score too): pure tie row
                    dets.append(dict(d))
        for _ in range(rng.randint(0, 3)):
            kp = np.zeros((17, 3))
            kp[:, 0] = rng.uniform(0, 400, 17)
            kp[:, 1] = rng.uniform(0, 400, 17)
            kp[:, 2] = 1
            dets.append({"image_id": img_id, "category_id": 1,
                         "score": qscore(),
                         "bbox": [float(rng.uniform(0, 300)),
                                  float(rng.uniform(0, 300)),
                                  float(rng.uniform(0, 100)),
                                  float(rng.uniform(0, 100))],
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


@pytest.mark.parametrize("seed", range(20))
def test_fuzz_degenerate_ties(seed):
    """The tie/degenerate regime: quantized scores, duplicate detections,
    zero-area boxes, single-point rows, multi-detection crowds."""
    gt, dets = _degenerate_case(seed)
    if not dets:
        pytest.skip("empty draw")
    dt = gt.load_res(dets)
    ev = KeypointEval(gt, dt)
    ours = ev.evaluate()
    twin = _eval_twin(gt, dt, ev.img_ids)
    assert set(twin) == set(ours)
    for k in sorted(ours):
        assert ours[k] == pytest.approx(twin[k], abs=1e-9), (seed, k)


def test_crowd_gt_absorbs_multiple_detections():
    """pycocotools lets a crowd gt be re-matched by ANY number of
    detections ("if this gt already matched, and not a crowd, continue"):
    a 0-keypoint crowd's expanded-bbox OKS is 1.0 for every detection
    inside it, so extra in-crowd detections must be IGNORED, not counted
    as FPs.  One real person (matched by one detection) + one crowd region
    swarmed by three detections must therefore score a perfect AP=1."""
    imgs = [{"id": 1, "height": 400, "width": 400, "file_name": "1.jpg"}]
    kps = np.zeros((17, 3))
    kps[:, 0] = np.linspace(210, 260, 17)
    kps[:, 1] = np.linspace(210, 260, 17)
    kps[:, 2] = 2
    anns = [
        # crowd region, no labeled keypoints
        {"id": 1, "image_id": 1, "category_id": 1, "iscrowd": 1,
         "num_keypoints": 0, "area": 10000.0, "bbox": [20, 20, 100, 100],
         "keypoints": [0.0] * 51},
        # one real person
        {"id": 2, "image_id": 1, "category_id": 1, "iscrowd": 0,
         "num_keypoints": 17, "area": 3600.0, "bbox": [205, 205, 60, 60],
         "keypoints": kps.reshape(-1).tolist()},
    ]
    gt = COCOIndex(dataset={"images": imgs, "annotations": anns,
                            "categories": [{"id": 1, "name": "person"}]})
    dets = [{"image_id": 1, "category_id": 1, "score": 0.9,
             "bbox": [205.0, 205.0, 60.0, 60.0],
             "keypoints": kps.reshape(-1).tolist()}]
    for i in range(3):  # swarm inside the crowd, below the real match
        kp = np.tile([60.0 + 5 * i, 60.0, 1.0], 17)
        dets.append({"image_id": 1, "category_id": 1, "score": 0.5 - 0.1 * i,
                     "bbox": [40.0 + 5 * i, 40.0, 50.0, 50.0],
                     "keypoints": kp.tolist()})
    dt = gt.load_res(dets)
    ours = KeypointEval(gt, dt).evaluate()
    twin = _eval_twin(gt, dt, [1])
    for k in ours:
        assert ours[k] == pytest.approx(twin[k], abs=1e-9), k
    # every in-crowd detection ignored -> no FPs -> perfect precision
    assert ours["AP"] == pytest.approx(1.0)
    assert ours["AR"] == pytest.approx(1.0)


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
