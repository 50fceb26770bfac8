"""Tests for the COCO.json / mask_miss generator tool."""

import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from make_coco_json import process_split, _vis_map  # noqa: E402

from multiposenet_tpu.data.coco_json import COCOIndex


def _make_index():
    def person(aid, img_id, nk, bbox, v=2):
        kps = []
        for j in range(17):
            if j < nk:
                kps += [bbox[0] + 5 + j, bbox[1] + 5 + j, v]
            else:
                kps += [0, 0, 0]
        seg = [[bbox[0], bbox[1], bbox[0] + bbox[2], bbox[1],
                bbox[0] + bbox[2], bbox[1] + bbox[3], bbox[0], bbox[1] + bbox[3]]]
        return {"id": aid, "image_id": img_id, "category_id": 1,
                "iscrowd": 0, "num_keypoints": nk, "area": bbox[2] * bbox[3],
                "bbox": bbox, "keypoints": kps, "segmentation": seg}

    return COCOIndex(dataset={
        "images": [{"id": 7, "height": 120, "width": 160,
                    "file_name": "COCO_val2014_000000000007.jpg"}],
        "categories": [{"id": 1, "name": "person"}],
        "annotations": [
            person(1, 7, 12, [10, 10, 40, 60]),    # main person
            person(2, 7, 8, [90, 20, 40, 60]),     # other main person
            person(3, 7, 0, [10, 80, 30, 30]),     # no keypoints -> mask_miss
        ],
    })


def test_vis_mapping():
    kps = [5, 6, 2, 7, 8, 1, 0, 0, 0] + [0, 0, 0] * 14
    j = _vis_map(kps)
    assert j[0, 2] == 1   # visible -> 1
    assert j[1, 2] == 0   # occluded -> 0
    assert j[2, 2] == 2   # unlabeled -> 2


def test_process_split_records_and_masks(tmp_path):
    coco = _make_index()
    records = []
    mask_dir = str(tmp_path / "masks")
    os.makedirs(mask_dir)
    process_split(coco, "COCO_val", {7}, records, mask_dir, 0)

    assert len(records) == 2  # two annotated persons
    r = records[0]
    assert r["dataset"] == "COCO_val"
    assert r["isValidation"] == 1.0
    assert r["numOtherPeople"] == 1
    np.testing.assert_allclose(r["objpos"], [30, 40])
    assert abs(r["scale_provided"] - 60 / 368.0) < 1e-9
    assert np.asarray(r["joint_self"]).shape == (17, 3)
    # singleton joint_others collapses to 2-D (reference get_anno expands it)
    assert np.asarray(r["joint_others"]).shape == (17, 3)

    # mask_miss: 0 on the keypointless person, 255 elsewhere
    mask = cv2.imread(os.path.join(
        mask_dir, "val2014_mask_miss_000000000007.png"), 0)
    assert mask is not None
    assert mask[95, 25] == 0       # inside keypointless person
    assert mask[40, 30] == 255     # inside main person
    assert mask[5, 150] == 255     # background


def test_records_feed_keypoint_dataset(tmp_path):
    """Generated records must be consumable by KeypointDataset."""
    from multiposenet_tpu.config import DataConfig
    from multiposenet_tpu.data.datasets import KeypointDataset

    coco = _make_index()
    records = []
    mask_dir = str(tmp_path)
    os.makedirs(os.path.join(mask_dir, "mask2014"), exist_ok=True)
    process_split(coco, "COCO_val", {7}, records,
                  os.path.join(mask_dir, "mask2014"), 0)

    img_dir = str(tmp_path / "images")
    os.makedirs(img_dir)
    cv2.imwrite(os.path.join(img_dir, "COCO_val2014_000000000007.jpg"),
                (np.random.RandomState(0).rand(120, 160, 3) * 255).astype(np.uint8))

    cfg = DataConfig(inp_size=64, max_people=4)
    ds = KeypointDataset(records, [0, 1], img_dir, mask_dir, cfg, augment=True)
    item = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert item["image"].shape == (64, 64, 3)
    assert item["joints"].shape == (4, 18, 3)
    assert item["mask"].shape == (16, 16)
    assert 0.0 <= item["mask"].min() and item["mask"].max() <= 1.0 + 1e-3
