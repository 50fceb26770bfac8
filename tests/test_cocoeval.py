"""OKS evaluation tests on synthetic ground truth."""

import numpy as np

from multiposenet_tpu.data.coco_json import COCOIndex
from multiposenet_tpu.eval.cocoeval import KeypointEval, compute_oks, KPT_SIGMAS


def _person(ann_id, img_id, cx, cy, area=3000.0, n=17):
    kps = []
    for j in range(17):
        if j < n:
            kps += [cx + 3 * j, cy + 2 * j, 2]
        else:
            kps += [0, 0, 0]
    return {"id": ann_id, "image_id": img_id, "category_id": 1, "iscrowd": 0,
            "num_keypoints": n, "area": area,
            "bbox": [cx - 10, cy - 10, 60, 60], "keypoints": kps}


def make_gt(num_imgs=4, people_per_img=2):
    imgs, anns = [], []
    aid = 1
    for i in range(1, num_imgs + 1):
        imgs.append({"id": i, "height": 400, "width": 400,
                     "file_name": f"{i}.jpg"})
        for p in range(people_per_img):
            anns.append(_person(aid, i, 50 + 150 * p, 60 + 100 * p))
            aid += 1
    return COCOIndex(dataset={"images": imgs, "annotations": anns,
                              "categories": [{"id": 1, "name": "person"}]})


def _dets_from_gt(gt, noise=0.0, score=0.9, drop=0):
    rng = np.random.RandomState(0)
    dets = []
    for ann in list(gt.anns.values())[drop:]:
        kp = np.array(ann["keypoints"], float)
        kp[0::3] += rng.randn(17) * noise
        kp[1::3] += rng.randn(17) * noise
        kp[2::3] = 1
        dets.append({"image_id": ann["image_id"], "category_id": 1,
                     "score": score, "keypoints": kp.tolist()})
    return dets


def test_oks_perfect_is_one():
    gt = make_gt()
    ann = next(iter(gt.anns.values()))
    kp = np.array(ann["keypoints"], float)
    oks = compute_oks(kp, kp, ann["area"], ann["bbox"])
    assert abs(oks - 1.0) < 1e-9


def test_oks_decreases_with_distance():
    gt = make_gt()
    ann = next(iter(gt.anns.values()))
    kp = np.array(ann["keypoints"], float)
    prev = 1.0
    for d in (2, 5, 10, 30):
        shifted = kp.copy()
        shifted[0::3] += d
        oks = compute_oks(shifted, kp, ann["area"], ann["bbox"])
        assert oks < prev
        prev = oks


def test_perfect_detections_ap1():
    gt = make_gt()
    dt = gt.load_res(_dets_from_gt(gt))
    r = KeypointEval(gt, dt).evaluate()
    assert abs(r["AP"] - 1.0) < 1e-6, r
    assert abs(r["AR"] - 1.0) < 1e-6


def test_missing_detections_reduce_recall():
    gt = make_gt(num_imgs=4, people_per_img=2)  # 8 people
    dt = gt.load_res(_dets_from_gt(gt, drop=4))
    r = KeypointEval(gt, dt).evaluate()
    assert r["AR"] <= 0.5 + 1e-6
    assert r["AP"] <= 0.55


def test_noisy_detections_between_zero_and_one():
    gt = make_gt()
    dt = gt.load_res(_dets_from_gt(gt, noise=2.0))
    r = KeypointEval(gt, dt).evaluate()
    assert 0.0 < r["AP"] < 1.0


def test_false_positives_reduce_precision():
    gt = make_gt(num_imgs=2, people_per_img=1)
    dets = _dets_from_gt(gt)
    # add high-scoring garbage detections
    for i in (1, 2):
        dets.append({"image_id": i, "category_id": 1, "score": 0.95,
                     "keypoints": [390, 390, 1] * 17})
    dt = gt.load_res(dets)
    r = KeypointEval(gt, dt).evaluate()
    assert r["AP"] < 1.0
    assert r["AR"] > 0.9  # all gts still matched


def test_gt_without_keypoints_is_ignored():
    gt = make_gt(num_imgs=1, people_per_img=1)
    # add a zero-keypoint gt: must not count as a miss
    gt.dataset["annotations"].append(_person(99, 1, 300, 300, n=0))
    gt._build()
    dt = gt.load_res(_dets_from_gt(gt)[:1])
    r = KeypointEval(gt, dt).evaluate()
    assert abs(r["AP"] - 1.0) < 1e-6


def test_summary_format():
    gt = make_gt()
    dt = gt.load_res(_dets_from_gt(gt))
    ev = KeypointEval(gt, dt)
    ev.evaluate()
    s = ev.summarize()
    assert s.count("\n") == 9
    assert "IoU=0.50:0.95" in s and "maxDets= 20" in s


def test_sigmas_match_coco():
    assert len(KPT_SIGMAS) == 17
    assert abs(KPT_SIGMAS[0] - 0.026) < 1e-9


def test_dt_area_from_person_box_drives_area_bucket_ignore():
    """Unmatched detections outside an area bucket are ignored, and the dt
    area that decides this comes from the person DETECTION box (pycocotools
    loadRes bbox branch: area = w*h), not the keypoint extent.  An
    out-of-bucket false positive must not cost medium-bucket AP, while an
    in-bucket one must (pycocotools cocoeval.evaluateImg dt-ignore rule)."""
    gt = make_gt(num_imgs=1, people_per_img=1)
    # the gt person: area 3000 -> inside the medium bucket [32^2, 96^2]
    tp = _dets_from_gt(gt)
    tp[0]["bbox"] = [40.0, 50.0, 50.0, 60.0]  # 3000 -> medium

    fp_kps = [390.0, 390.0, 1.0] * 17  # far from the gt, never matches
    fp_large = dict(image_id=1, category_id=1, score=0.95, keypoints=fp_kps,
                    bbox=[200.0, 200.0, 150.0, 150.0])  # 22500 -> large
    fp_medium = dict(image_id=1, category_id=1, score=0.95, keypoints=fp_kps,
                     bbox=[200.0, 200.0, 50.0, 60.0])   # 3000 -> medium

    r_large = KeypointEval(gt, gt.load_res(tp + [fp_large])).evaluate()
    r_medium = KeypointEval(gt, gt.load_res(tp + [fp_medium])).evaluate()

    # the large-box FP is ignored in the medium bucket -> perfect AP there
    assert abs(r_large["AP_medium"] - 1.0) < 1e-6, r_large
    # the medium-box FP counts as a medium-bucket false positive
    assert r_medium["AP_medium"] < 1.0 - 1e-6, r_medium
    # in the 'all' bucket both FPs count equally
    assert abs(r_large["AP"] - r_medium["AP"]) < 1e-9
