"""Generate the keypoint-pipeline index (`COCO.json`) and mask_miss PNGs
from standard COCO annotations.

The reference pipeline consumes two preprocessed artifacts inherited from
ZheC/Realtime_Multi-Person_Pose_Estimation that users must download
(reference README.md, datasets/coco.py:17-29, COCO_data_pipeline.py:240-252):

  COCO.json   {'root': [records]} — one record per annotated person with
              augmentation metadata (objpos, scale_provided, joint_self,
              joint_others, isValidation for the 2644-image minival split)
  mask2014/   per-image `*_mask_miss_*.png` — 255 everywhere except persons
              that have no labeled keypoints (their area is excluded from
              the heatmap loss)

This tool produces both from person_keypoints_{train,val}2014 jsons, so the
framework is trainable from a vanilla COCO download.

COCO visibility -> pipeline visibility: v=2 (visible) -> 1,
v=1 (labeled, occluded) -> 0, v=0 (unlabeled) -> 2 (never drawn).

Usage:
  python tools/make_coco_json.py --coco-root /data/COCO \
      --out-json /data/COCO/COCO.json --mask-dir /data/COCO/mask2014
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multiposenet_tpu.data.coco_json import COCOIndex  # noqa: E402
from multiposenet_tpu.data.rle import ann_to_mask  # noqa: E402

TARGET_SIZE = 368.0   # scale_provided normalizer (ZheC convention)
MINIVAL_COUNT = 2644  # first N val2014 images -> isValidation=1


def _vis_map(kps):
    """(17, 3) COCO keypoints -> pipeline joints with remapped visibility."""
    j = np.asarray(kps, np.float64).reshape(17, 3)
    v = j[:, 2].copy()
    out_v = np.where(v == 2, 1.0, np.where(v == 1, 0.0, 2.0))
    return np.stack([j[:, 0], j[:, 1], out_v], axis=1)


def _person_record(ann, others, img_info, dataset, is_val, people_index,
                   annolist_index):
    bbox = ann["bbox"]
    rec = {
        "dataset": dataset,
        "img_paths": img_info["file_name"],
        "img_height": img_info["height"],
        "img_width": img_info["width"],
        "image_id": img_info["id"],
        "isValidation": float(is_val),
        "people_index": people_index,
        "annolist_index": annolist_index,
        "objpos": [bbox[0] + bbox[2] / 2.0, bbox[1] + bbox[3] / 2.0],
        "scale_provided": bbox[3] / TARGET_SIZE,
        "joint_self": _vis_map(ann["keypoints"]).tolist(),
        "numOtherPeople": len(others),
        "num_keypoints_other": [o["num_keypoints"] for o in others],
        "scale_provided_other": [o["bbox"][3] / TARGET_SIZE for o in others],
        "objpos_other": [[o["bbox"][0] + o["bbox"][2] / 2.0,
                          o["bbox"][1] + o["bbox"][3] / 2.0] for o in others],
        "bbox_other": [o["bbox"] for o in others],
        "segment_area_other": [o["area"] for o in others],
        "joint_others": [_vis_map(o["keypoints"]).tolist() for o in others],
    }
    if len(others) == 1:
        # the reference expands singleton lists back to 2-D (get_anno)
        rec["joint_others"] = rec["joint_others"][0]
        rec["objpos_other"] = rec["objpos_other"][0]
    return rec


def process_split(coco: COCOIndex, dataset: str, val_ids, records,
                  mask_dir: str, annolist_base: int, min_keypoints: int = 5,
                  min_area: float = 32 * 32, img_prefix: str = ""):
    """`img_prefix` is joined onto each file_name in img_paths — for the real
    COCO layout pass 'train2014'/'val2014' (images live under
    images/<split>2014/); empty keeps bare file names."""
    import cv2

    img_ids = coco.get_img_ids(cat_ids=[1])
    for annolist_index, img_id in enumerate(img_ids):
        info = dict(coco.load_imgs(img_id)[0])
        if img_prefix:
            info["file_name"] = os.path.join(img_prefix, info["file_name"])
        anns = [a for a in coco.img_to_anns[img_id]
                if a.get("category_id") == 1]
        h, w = info["height"], info["width"]

        main, missing = [], []
        for a in anns:
            if a.get("iscrowd") or a.get("num_keypoints", 0) < min_keypoints \
                    or a.get("area", 0) < min_area:
                missing.append(a)
            else:
                main.append(a)

        if mask_dir:
            mask_miss = np.full((h, w), 255, np.uint8)
            for a in missing:
                try:
                    m = ann_to_mask(a, h, w)
                    mask_miss[m > 0] = 0
                except Exception:
                    pass
            prefix = "val2014" if "val" in dataset.lower() else "train2014"
            stem = info["file_name"][-16:-4]  # zero-padded 12-digit id + '.'
            out = os.path.join(mask_dir,
                               f"{prefix}_mask_miss_{stem}.png")
            cv2.imwrite(out, mask_miss)

        is_val = img_id in val_ids
        for pi, ann in enumerate(main):
            others = [o for o in main if o is not ann] + \
                     [o for o in missing if o.get("num_keypoints", 0) > 0]
            records.append(_person_record(
                ann, others, info, dataset, is_val, pi,
                annolist_base + annolist_index))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coco-root", required=True)
    ap.add_argument("--out-json", required=True)
    ap.add_argument("--mask-dir", default=None)
    ap.add_argument("--min-keypoints", type=int, default=5)
    args = ap.parse_args()

    if args.mask_dir:
        os.makedirs(args.mask_dir, exist_ok=True)

    records = []
    val_path = os.path.join(args.coco_root,
                            "annotations/person_keypoints_val2014.json")
    train_path = os.path.join(args.coco_root,
                              "annotations/person_keypoints_train2014.json")

    coco_val = COCOIndex(val_path)
    minival = set(coco_val.get_img_ids(cat_ids=[1])[:MINIVAL_COUNT])
    process_split(coco_val, "COCO_val", minival, records, args.mask_dir, 0,
                  args.min_keypoints, img_prefix="val2014")
    coco_train = COCOIndex(train_path)
    process_split(coco_train, "COCO", set(), records, args.mask_dir,
                  10 ** 6, args.min_keypoints, img_prefix="train2014")

    with open(args.out_json, "w") as f:
        json.dump({"root": records}, f)
    print(f"wrote {len(records)} person records to {args.out_json}")


if __name__ == "__main__":
    main()
