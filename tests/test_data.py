"""Data pipeline tests: RLE codec, COCO index, joint reordering, PRN marks."""

import numpy as np

from multiposenet_tpu.config import Config
from multiposenet_tpu.data.coco_json import COCOIndex
from multiposenet_tpu.data.datasets import (
    OUR_ORDER_17,
    OUR_ORDER_18,
    PRNDataset,
    add_neck,
    split_keypoint_records,
)
from multiposenet_tpu.data.rle import (
    ann_to_mask,
    decode_rle,
    encode_rle,
    polys_to_mask,
)
from multiposenet_tpu.data.augment import boxes_from_masks, pad_boxes


# ---------------------------------------------------------------------- rle

def test_rle_roundtrip_random(rng):
    for _ in range(5):
        m = (rng.rand(37, 53) > 0.7).astype(np.uint8)
        rec = decode_rle(encode_rle(m))
        np.testing.assert_array_equal(rec, m)


def test_rle_uncompressed_column_major():
    # 2x3 mask, counts in column-major: [0-run, 1-run, ...]
    m = np.array([[1, 0, 1], [0, 1, 0]], np.uint8)
    flat = m.T.reshape(-1)  # col-major: 1,0,0,1,1,0
    # runs: first val 1 -> leading 0-run of length 0
    rle = {"size": [2, 3], "counts": [0, 1, 2, 2, 1]}
    np.testing.assert_array_equal(decode_rle(rle), m)


def test_rle_empty_and_full():
    z = np.zeros((5, 4), np.uint8)
    f = np.ones((5, 4), np.uint8)
    np.testing.assert_array_equal(decode_rle(encode_rle(z)), z)
    np.testing.assert_array_equal(decode_rle(encode_rle(f)), f)


def test_polygon_mask_square():
    m = polys_to_mask([[2, 2, 8, 2, 8, 8, 2, 8]], 12, 12)
    assert m[5, 5] == 1 and m[0, 0] == 0
    assert m.sum() >= 36  # at least the 6x6 interior


def test_ann_to_mask_dispatch():
    ann_poly = {"segmentation": [[1, 1, 4, 1, 4, 4, 1, 4]]}
    m1 = ann_to_mask(ann_poly, 6, 6)
    assert m1.shape == (6, 6) and m1.sum() > 0
    ann_rle = {"segmentation": {"size": [6, 6], "counts": [10, 5, 21]}}
    m2 = ann_to_mask(ann_rle, 6, 6)
    assert m2.sum() == 5


# --------------------------------------------------------------- coco index

def make_gt_index():
    return COCOIndex(dataset={
        "images": [{"id": 1, "height": 100, "width": 100, "file_name": "a.jpg"},
                   {"id": 2, "height": 80, "width": 60, "file_name": "b.jpg"}],
        "categories": [{"id": 1, "name": "person"}],
        "annotations": [
            {"id": 10, "image_id": 1, "category_id": 1, "iscrowd": 0,
             "num_keypoints": 5, "area": 900.0, "bbox": [10, 10, 30, 30],
             "keypoints": [15, 15, 2] * 5 + [0, 0, 0] * 12},
            {"id": 11, "image_id": 2, "category_id": 1, "iscrowd": 0,
             "num_keypoints": 0, "area": 100.0, "bbox": [5, 5, 10, 10],
             "keypoints": [0, 0, 0] * 17},
        ],
    })


def test_coco_index_lookups():
    c = make_gt_index()
    assert c.get_img_ids(cat_ids=[1]) == [1, 2]
    assert c.get_ann_ids(img_ids=1) == [10]
    assert c.load_anns(10)[0]["area"] == 900.0
    assert c.loadImgs(2)[0]["file_name"] == "b.jpg"


def test_coco_load_res_keypoint_branch_includes_zero_triples():
    """pycocotools loadRes keypoint branch: bbox/area from extents over ALL
    triples INCLUDING (0,0) v=0 slots (cocoapi coco.py loadRes)."""
    c = make_gt_index()
    res = c.load_res([{"image_id": 1, "category_id": 1, "score": 0.9,
                       "keypoints": [10, 10, 1, 20, 30, 1] + [0, 0, 0] * 15}])
    ann = res.img_to_anns[1][0]
    # the fifteen (0,0,0) slots drag the extent to the origin
    assert ann["area"] == 20 * 30
    assert ann["bbox"] == [0, 0, 20, 30]
    assert ann["id"] == 1


def test_coco_load_res_bbox_branch_takes_precedence():
    """When results carry a non-empty bbox (the reference's results always
    do, tester.py:503-510) pycocotools' bbox branch fires: area = w*h of the
    detection box, bbox preserved, iscrowd forced, segmentation added."""
    c = make_gt_index()
    res = c.load_res([{"image_id": 1, "category_id": 1, "score": 0.9,
                       "bbox": [5.0, 6.0, 40.0, 50.0], "iscrowd": 7,
                       "keypoints": [10, 10, 1, 20, 30, 1] + [0, 0, 0] * 15}])
    ann = res.img_to_anns[1][0]
    assert ann["area"] == 40.0 * 50.0
    assert ann["bbox"] == [5.0, 6.0, 40.0, 50.0]
    assert ann["iscrowd"] == 0
    assert ann["segmentation"] == [[5.0, 6.0, 5.0, 56.0, 45.0, 56.0, 45.0, 6.0]]
    assert ann["id"] == 1


def test_coco_load_res_branch_chosen_once_from_first_dict():
    """pycocotools decides the branch ONCE by probing anns[0] ('bbox' in
    anns[0] and anns[0]['bbox'] != []) and applies it to the WHOLE list.
    A mixed list whose first dict lacks bbox must take the keypoint branch
    for every dict — including later dicts that DO carry a bbox, whose
    bbox/area get overwritten by the keypoint extent."""
    c = make_gt_index()
    res = c.load_res([
        {"image_id": 1, "category_id": 1, "score": 0.9,
         "keypoints": [10, 10, 1, 20, 30, 1] + [0, 0, 0] * 15},
        {"image_id": 1, "category_id": 1, "score": 0.8,
         "bbox": [5.0, 6.0, 40.0, 50.0],
         "keypoints": [10, 10, 1, 20, 30, 1] + [0, 0, 0] * 15},
    ])
    first, second = res.img_to_anns[1]
    # both went through the keypoint-extent branch
    assert first["bbox"] == [0, 0, 20, 30] and first["area"] == 600
    assert second["bbox"] == [0, 0, 20, 30] and second["area"] == 600


# ------------------------------------------------------------------- joints

def test_add_neck_matches_reference_semantics():
    j = np.zeros((17, 3))
    j[5] = [10, 20, 1]   # l shoulder
    j[6] = [20, 20, 0]   # r shoulder
    j[0] = [15, 5, 0]    # nose
    out = add_neck(j)
    assert out.shape == (18, 3)
    # internal order: 0 nose, 1 neck
    np.testing.assert_allclose(out[0], [15, 5, 0])
    np.testing.assert_allclose(out[1], [15, 20, 1])  # midpoint, v=1 (one v==1)
    # index 2 = right shoulder (COCO 6)
    np.testing.assert_allclose(out[2], [20, 20, 0])
    # v rules: both v=2 -> 2
    j2 = j.copy()
    j2[5, 2] = j2[6, 2] = 2
    assert add_neck(j2)[1, 2] == 2
    # both v=0 -> 0*0=0
    j3 = j.copy()
    j3[5, 2] = j3[6, 2] = 0
    assert add_neck(j3)[1, 2] == 0


def test_split_keypoint_records():
    recs = [{"isValidation": 0.0}, {"isValidation": 1.0}, {"isValidation": 0.0}]
    assert split_keypoint_records(recs, True) == [0, 2]
    assert split_keypoint_records(recs, False) == [1]


def test_flip_order_is_involution():
    from multiposenet_tpu.data.augment import FLIP_ORDER_18
    perm = np.array(FLIP_ORDER_18)
    np.testing.assert_array_equal(perm[perm], np.arange(18))
    perm17 = np.array(OUR_ORDER_17)
    assert sorted(perm17.tolist()) == list(range(17))
    assert sorted(OUR_ORDER_18) == list(range(18))


# ---------------------------------------------------------------------- prn

def test_prn_dataset_marks():
    cfg = Config()
    gt = COCOIndex(dataset={
        "images": [{"id": 1, "height": 100, "width": 100, "file_name": "a.jpg"}],
        "categories": [{"id": 1, "name": "person"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1, "iscrowd": 0,
             "num_keypoints": 5, "area": 900, "bbox": [10, 10, 36, 56],
             # nose at (14, 16), l shoulder (COCO 5) at (30, 40)
             "keypoints": ([14, 16, 2] + [0, 0, 0] * 4 + [30, 40, 1] +
                           [0, 0, 0] * 11)},
            {"id": 2, "image_id": 1, "category_id": 1, "iscrowd": 0,
             "num_keypoints": 4, "area": 400, "bbox": [60, 60, 20, 20],
             # nose far outside ann1's expanded box
             "keypoints": [95, 95, 2] + [0, 0, 0] * 16},
        ],
    })
    ds = PRNDataset(gt, cfg)
    assert len(ds) == 2
    item = ds[0]  # highest num_keypoints first
    w, l = item["weights_marks"], item["label_marks"]
    gh, gw = cfg.model.prn_height, cfg.model.prn_width  # 56, 36
    assert w.shape == (gh, gw, 17) and l.shape == (gh, gw, 17)
    # label: nose (internal ch 0): x0 = int((14-10)*36/36)=4, y0=int((16-10)*1)=6
    assert l[6, 4, 0] == 1
    # l shoulder COCO 5 -> internal index OUR_ORDER_17.index(5) = 4
    ch = OUR_ORDER_17.index(5)
    assert l[30, 20, ch] == 1
    # weights include own + neighbors inside expanded bbox; ann2's nose is outside
    assert w[6, 4, 0] == 1
    assert w.sum() == l.sum()  # neighbor contributed nothing


# ------------------------------------------------------------------- augment

def test_boxes_from_masks_and_padding():
    m1 = np.zeros((50, 50), np.uint8); m1[10:20, 5:15] = 1
    m2 = np.zeros((50, 50), np.uint8)  # empty after augmentation
    crowd = np.ones((50, 50), np.uint8)
    boxes = boxes_from_masks([m1, crowd, m2], [0, -1, 0])
    assert boxes.shape == (2, 5)
    np.testing.assert_allclose(boxes[0], [5, 10, 15, 20, 0])
    np.testing.assert_allclose(boxes[1], [-1, -1, -1, -1, -1])
    padded = pad_boxes(boxes, 4)
    assert padded.shape == (4, 5)
    assert (padded[2:] == -1).all()


# ------------------------------------------------------------------ loader

def test_device_prefetch_order_exceptions_and_early_exit():
    import time
    from multiposenet_tpu.data.loader import device_prefetch

    # order preserved, every item delivered, put_fn applied off-thread
    out = list(device_prefetch(iter(range(7)), lambda x: x * 10, depth=2))
    assert out == [0, 10, 20, 30, 40, 50, 60]

    # exceptions from the source iterator propagate to the consumer
    def bad():
        yield 1
        raise RuntimeError("boom")
    g = device_prefetch(bad(), lambda x: x, depth=2)
    assert next(g) == 1
    try:
        next(g)
        assert False, "expected RuntimeError"
    except RuntimeError as e:
        assert "boom" in str(e)

    # abandoning the consumer must not deadlock the pump thread
    import threading
    before = threading.active_count()
    g = device_prefetch(iter(range(1000)), lambda x: x, depth=2)
    assert next(g) == 0
    g.close()  # triggers the generator's finally -> stop event
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before

    # ... including when the SOURCE RAISES against a full queue after the
    # consumer left: the error put must honor the stop event too
    def short_then_raise():
        for i in range(3):
            yield i
        raise RuntimeError("late")
    g = device_prefetch(short_then_raise(), lambda x: x, depth=1)
    assert next(g) == 0
    g.close()
    deadline = time.time() + 5.0
    while (any(t.name == "device_prefetch" for t in threading.enumerate())
           and time.time() < deadline):
        time.sleep(0.05)
    assert not any(t.name == "device_prefetch"
                   for t in threading.enumerate())


def test_loader_copy_same_settings():
    from multiposenet_tpu.data.loader import Loader

    class DS:
        def __len__(self):
            return 8
        def __getitem__(self, i, rng=None):
            return {"x": np.full((2,), i, np.float32)}

    a = Loader(DS(), batch_size=2, shuffle=True, num_workers=2, seed=5)
    list(a)  # advance epoch
    b = a.copy()
    assert (b.dataset, b.batch_size, b.num_workers, b.seed) == \
        (a.dataset, a.batch_size, a.num_workers, a.seed)
    assert b.epoch == 0  # fresh epoch counter
    batches = list(b)
    assert len(batches) == 4 and batches[0]["x"].shape == (2, 2)
