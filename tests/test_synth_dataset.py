"""On-disk contract of tools/make_synth_pose_dataset.py.

The generator feeds all three training stages and coco-eval through the
exact layouts the CLI consumes.  The load-bearing pin here is the CMU
COCO.json visibility convention — in those records v=2 means NOT labeled
(reference COCO_data_pipeline.py:137-151: heatmap gaussians draw iff
v <= 1) while the standard COCO annotation jsons keep v=2 = visible.  A
convention mixup silently yields all-empty heatmap targets and a model
that "trains" to predict zeros; test_keypoint_targets_have_peaks fails
loudly in that case.
"""
import dataclasses
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synthcoco"))
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.run(
        [sys.executable,
         os.path.join(REPO, "tools", "make_synth_pose_dataset.py"),
         "--root", root, "--n-train", "4", "--n-val", "2",
         "--width", "320", "--height", "256", "--seed", "3"],
        check=True, env=env, capture_output=True)
    return root


def _data_cfg(root):
    from multiposenet_tpu.config import DataConfig
    return dataclasses.replace(
        DataConfig(), coco_root=root,
        json_path=os.path.join(root, "COCO.json"),
        mask_dir=root,
        inp_size=256, num_workers=0)


def test_records_use_cmu_visibility(synth_root):
    with open(os.path.join(synth_root, "COCO.json")) as f:
        records = json.load(f)["root"]
    assert len(records) >= 6
    for rec in records:
        js = np.asarray(rec["joint_self"], np.float32)
        assert js.shape == (17, 3)
        # most joints must be labeled (v<=1) under the CMU convention;
        # an inverted writer marks nearly all of them v=2 (missing)
        assert (js[:, 2] <= 1.0).sum() >= 8, rec["img_paths"]


def test_keypoint_targets_have_peaks(synth_root):
    from multiposenet_tpu.data.datasets import (
        KeypointDataset, load_coco_json_index, split_keypoint_records)
    from multiposenet_tpu.ops.heatmap import make_heatmaps_np

    cfg = _data_cfg(synth_root)
    records = load_coco_json_index(cfg.json_path)
    idx = split_keypoint_records(records, True)
    assert idx, "no training records"
    ds = KeypointDataset(records, idx,
                         os.path.join(synth_root, "images"),
                         cfg.mask_dir, cfg, augment=False)
    s = ds[0]
    jp = s["joints"]
    assert (jp[..., 2] <= 1.0).sum() >= 5, "no drawable joints after crop"
    heat = make_heatmaps_np(jp, 256 // 4, 256 // 4, stride=4, sigma=7.0)
    assert heat.max() > 0.9, "heatmap targets are empty (visibility bug?)"
    assert float(s["mask"].min()) > 0.99, "synthetic miss-mask must be all-valid"


def test_detection_dataset_yields_boxes(synth_root):
    from multiposenet_tpu.data.coco_json import COCOIndex
    from multiposenet_tpu.data.datasets import (
        DetectionDataset, load_coco_json_index)

    cfg = _data_cfg(synth_root)
    ann = os.path.join(synth_root, "annotations",
                       "person_keypoints_train2017.json")
    coco = COCOIndex(ann)
    records = load_coco_json_index(cfg.json_path)
    img_ids = set(coco.get_img_ids())
    idx = [i for i, r in enumerate(records)
           if int(r["image_id"]) in img_ids]
    ds = DetectionDataset(records, idx, coco,
                          os.path.join(synth_root, "train2017"),
                          cfg, augment=False)
    assert len(ds) > 0
    s = ds[0]
    boxes = s["boxes"]
    real = boxes[boxes[:, 4] == 0]
    assert len(real) >= 1
    assert ((real[:, 2] - real[:, 0]) > 0).all()
    assert ((real[:, 3] - real[:, 1]) > 0).all()


def test_prn_dataset_marks(synth_root):
    from multiposenet_tpu.config import Config
    from multiposenet_tpu.data.coco_json import COCOIndex

    from multiposenet_tpu.data.datasets import PRNDataset
    ann = os.path.join(synth_root, "annotations",
                       "person_keypoints_train2017.json")
    ds = PRNDataset(COCOIndex(ann), Config())
    assert len(ds) > 0
    s = ds[0]
    assert s["label_marks"].max() == 1.0
    # weights cover the labeled person's own joints at minimum
    assert s["weights_marks"].sum() >= s["label_marks"].sum()


def test_eval_layout(synth_root):
    from multiposenet_tpu.data.coco_json import COCOIndex
    ann = os.path.join(synth_root, "annotations",
                       "person_keypoints_val2017.json")
    coco = COCOIndex(ann)
    ids = coco.get_img_ids()
    assert len(ids) == 2
    for info in coco.load_imgs(ids):
        p = os.path.join(synth_root, "images", "val2017", info["file_name"])
        assert os.path.exists(p), p
    for a in coco.load_anns(coco.get_ann_ids(ids[0])):
        assert len(a["keypoints"]) == 17 * 3
        assert a["area"] > 0


def test_crowd_scenes_generated(tmp_path):
    """--crowd-frac 1.0 yields crowd images (>= 6 overlapping people) in
    both the annotation json and the CMU keypoint records — the scenes the
    gate uses to exercise PRN contention and capacity escalation."""
    root = str(tmp_path / "crowds")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.run(
        [sys.executable,
         os.path.join(REPO, "tools", "make_synth_pose_dataset.py"),
         "--root", root, "--n-train", "4", "--n-val", "2",
         "--width", "320", "--height", "240", "--seed", "1",
         "--crowd-frac", "1.0"],
        check=True, env=env, capture_output=True)
    with open(os.path.join(root, "annotations",
                           "person_keypoints_val2017.json")) as f:
        ann = json.load(f)
    per_img = {}
    for a in ann["annotations"]:
        per_img[a["image_id"]] = per_img.get(a["image_id"], 0) + 1
    assert max(per_img.values()) >= 6, per_img
    with open(os.path.join(root, "COCO.json")) as f:
        recs = json.load(f)["root"]
    assert max(r["numOtherPeople"] for r in recs) >= 5


def test_ap_floor_check_fails_on_regression(tmp_path):
    """The gate's pass/fail logic: an AP 10% under the measured value must
    FAIL against a floor set at measured-0.05 (VERDICT r3 item 5)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import check_ap_floor
    finally:
        sys.path.pop(0)
    good = tmp_path / "good.json"
    bad = tmp_path / "bad.json"
    good.write_text(json.dumps({"AP": 0.630}))
    bad.write_text(json.dumps({"AP": 0.630 * 0.9}))   # injected 10% drop
    assert check_ap_floor.check(str(good), 0.58)
    assert not check_ap_floor.check(str(bad), 0.58)
    # a metrics file with no AP key can never pass
    empty = tmp_path / "empty.json"
    empty.write_text("{}")
    assert not check_ap_floor.check(str(empty), 0.0)


def test_gate_truncation_check(tmp_path):
    """The gate's zero-truncation assert (VERDICT r4 item 2): any
    WARNING-level capacity-drop line in the coco-eval log fails; the
    INFO escalation re-dispatch lines (the intended path — taken
    verbatim from the round-4 passing gate log) do not."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import check_ap_floor
    finally:
        sys.path.pop(0)
    clean = tmp_path / "clean.log"
    clean.write_text(
        "2026-08-20 09:13:20,486 INFO multiposenet_tpu: 000000000130.jpg: "
        "peak capacity 8 saturated — re-dispatching at the escalated "
        "tier 128\n"
        "2026-08-20 09:14:15,143 INFO multiposenet_tpu: 000000000130.jpg: "
        "crowd overflow (9 peaks/joint, 7 boxes) — escalating PRN "
        "capacity to (128 peaks, 256 people)\n")
    assert check_ap_floor.check_no_truncation(str(clean))
    for bad_line in [
        # evaluator.py:78 (_joints_to_peak_arrays overflow)
        "WARNING multiposenet_tpu: img.jpg: dropped 3 peak(s) over the "
        "per-joint capacity 8 — raise cfg.peaks.escalate_max_peaks",
        # evaluator.py:487 (PRN person-capacity overflow)
        "WARNING multiposenet_tpu: img.jpg: 12 person boxes exceed the "
        "PRN person capacity 8; the 4 lowest-ranked are dropped",
        # evaluator.py:98 (device top-k saturation)
        "WARNING multiposenet_tpu: device peak capacity saturated for "
        "joint type(s) [0] (capacity 8): the on-device top-k may have "
        "truncated lower-scoring peaks",
    ]:
        log = tmp_path / "bad.log"
        log.write_text(clean.read_text() + bad_line + "\n")
        assert not check_ap_floor.check_no_truncation(str(log)), bad_line
    # main() combines floor + truncation: clean log but bad AP -> 1
    good = tmp_path / "m.json"
    good.write_text(json.dumps({"AP": 0.643}))
    assert check_ap_floor.main([str(good), "0.60", str(clean)]) == 0
    assert check_ap_floor.main([str(good), "0.65", str(clean)]) == 1


def test_ap_ablation_assertions(tmp_path, monkeypatch):
    """ap_ablation's two assertion layers: bounded toggles fail past
    |dAP| > tol, and EXACT toggles (xla_nms) fail on ANY summary-stat
    difference even inside the tolerance (the 2026-08-20 gate measured
    them protocol-identical; this keeps that an invariant)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import ap_ablation
    finally:
        sys.path.pop(0)

    base = {"AP": 0.643, "AP50": 0.783}

    def fake_eval(metrics_by_name):
        def run_eval(repo, args, name, flags, out_dir):
            return dict(metrics_by_name.get(name, base))
        return run_eval

    argv = ["--coco-root", "r", "--ckpt", "c",
            "--out-dir", str(tmp_path), "--assert-tol", "0.02"]

    # all equal -> PASS
    monkeypatch.setattr(ap_ablation, "run_eval", fake_eval({}))
    assert ap_ablation.main(argv) == 0
    # a bounded toggle 0.03 off -> FAIL
    monkeypatch.setattr(ap_ablation, "run_eval", fake_eval(
        {"bf16": {"AP": 0.613, "AP50": 0.783}}))
    assert ap_ablation.main(argv) == 1
    # xla_nms off by 1e-6 (inside the tolerance) -> still FAIL (exact)
    monkeypatch.setattr(ap_ablation, "run_eval", fake_eval(
        {"xla_nms": {"AP": 0.643 + 1e-6, "AP50": 0.783}}))
    assert ap_ablation.main(argv) == 1
    # host_grouping off by 1e-6 -> PASS (tolerance-bounded, tie-sensitive)
    monkeypatch.setattr(ap_ablation, "run_eval", fake_eval(
        {"host_grouping": {"AP": 0.643 + 1e-6, "AP50": 0.783}}))
    assert ap_ablation.main(argv) == 0
