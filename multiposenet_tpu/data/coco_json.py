"""Minimal COCO annotation index — replacement for pycocotools.coco.COCO.

Supports exactly the API surface the reference pipelines use
(datasets/coco.py:44-47, coco_data/COCO_data_pipeline.py:323-337,
prn_data_pipeline.py:75-121, evaluate/tester.py:132-185): ann/img lookup by
id, category-filtered image ids, and loading result files for evaluation.
"""

from __future__ import annotations

import copy
import json
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Union


class COCOIndex:
    def __init__(self, annotation_file: Optional[str] = None,
                 dataset: Optional[Dict] = None):
        if annotation_file is not None:
            with open(annotation_file) as f:
                dataset = json.load(f)
        self.dataset = dataset or {}
        self._build()

    def _build(self):
        self.anns: Dict[int, Dict] = {}
        self.imgs: Dict[int, Dict] = {}
        self.cats: Dict[int, Dict] = {}
        self.img_to_anns = defaultdict(list)
        self.cat_to_imgs = defaultdict(set)
        for img in self.dataset.get("images", []):
            self.imgs[img["id"]] = img
        for cat in self.dataset.get("categories", []):
            self.cats[cat["id"]] = cat
        for ann in self.dataset.get("annotations", []):
            self.anns[ann["id"]] = ann
            self.img_to_anns[ann["image_id"]].append(ann)
            if "category_id" in ann:
                self.cat_to_imgs[ann["category_id"]].add(ann["image_id"])

    # --- pycocotools-compatible accessors --------------------------------

    def get_img_ids(self, cat_ids: Sequence[int] = ()) -> List[int]:
        if not cat_ids:
            return sorted(self.imgs.keys())
        ids = None
        for c in cat_ids:
            s = self.cat_to_imgs[c]
            ids = s if ids is None else (ids & s)
        return sorted(ids or ())

    def get_ann_ids(self, img_ids: Union[int, Sequence[int], None] = None,
                    cat_ids: Sequence[int] = ()) -> List[int]:
        if img_ids is None:
            anns = list(self.anns.values())
        else:
            if isinstance(img_ids, int):
                img_ids = [img_ids]
            anns = [a for i in img_ids for a in self.img_to_anns[i]]
        if cat_ids:
            anns = [a for a in anns if a.get("category_id") in set(cat_ids)]
        return [a["id"] for a in anns]

    def load_anns(self, ids: Union[int, Sequence[int]]) -> List[Dict]:
        if isinstance(ids, int):
            ids = [ids]
        return [self.anns[i] for i in ids]

    def load_imgs(self, ids: Union[int, Sequence[int]]) -> List[Dict]:
        if isinstance(ids, int):
            ids = [ids]
        return [self.imgs[i] for i in ids]

    # camelCase aliases (drop-in for reference call sites)
    getImgIds = lambda self, catIds=(), **kw: self.get_img_ids(catIds)  # noqa: E731
    getAnnIds = lambda self, imgIds=None, catIds=(), **kw: self.get_ann_ids(imgIds, catIds)  # noqa: E731
    loadAnns = load_anns
    loadImgs = load_imgs

    def load_res(self, results: Union[str, List[Dict]]) -> "COCOIndex":
        """Build a result index sharing this gt's image table
        (pycocotools COCO.loadRes for keypoint/bbox result lists)."""
        if isinstance(results, str):
            with open(results) as f:
                results = json.load(f)
        res_dataset = {
            "images": list(self.imgs.values()),
            "categories": copy.deepcopy(self.dataset.get("categories", [])),
            "annotations": [],
        }
        for i, r in enumerate(results):
            ann = dict(r)
            ann.setdefault("id", i + 1)
            if "keypoints" in ann and "area" not in ann:
                kp = ann["keypoints"]
                xs = [kp[j] for j in range(0, len(kp), 3) if kp[j + 2] > 0]
                ys = [kp[j + 1] for j in range(0, len(kp), 3) if kp[j + 2] > 0]
                if xs:
                    x0, x1 = min(xs), max(xs)
                    y0, y1 = min(ys), max(ys)
                    ann["area"] = (x1 - x0) * (y1 - y0)
                    ann.setdefault("bbox", [x0, y0, x1 - x0, y1 - y0])
                else:
                    ann["area"] = 0
                    ann.setdefault("bbox", [0, 0, 0, 0])
            ann.setdefault("iscrowd", 0)
            res_dataset["annotations"].append(ann)
        return COCOIndex(dataset=res_dataset)
