"""Differential: dataset semantics vs the reference's Cocokeypoints methods.

Drives the REAL reference code (datasets/coco_data/COCO_data_pipeline.py,
imported with pycocotools stubbed — its COCO/maskUtils symbols are only
touched by dataset __init__/mask IO, not by the methods under test):

- ``add_neck`` — the parity-critical COCO-17 -> internal-18 permutation
  with the synthesized-neck visibility rules and np.round
  (COCO_data_pipeline.py:123-174);
- ``remove_illegal_joint`` — out-of-crop joints become (1, 1, 2)
  (COCO_data_pipeline.py:176-194);
- ``get_ground_truth`` — the full heat_mask + 18-channel heatmap target
  builder (COCO_data_pipeline.py:196-235), called as the real unbound
  method with the module's params_transform configured.

Ours: data/datasets.py add_neck, data/augment.py remove_illegal_joints,
ops/heatmap.make_heatmaps_np + the KeypointDataset mask-resize recipe.
"""

import sys
import types

import cv2
import numpy as np
import pytest

from multiposenet_tpu.data.augment import remove_illegal_joints
from multiposenet_tpu.data.datasets import add_neck
from multiposenet_tpu.ops.heatmap import make_heatmaps_np

from tests.reference_oracle import REFERENCE_ROOT


def _ref_pipeline():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    if "pycocotools" not in sys.modules:
        pkg = types.ModuleType("pycocotools")
        coco = types.ModuleType("pycocotools.coco")
        coco.COCO = object
        coco.maskUtils = types.SimpleNamespace()
        pkg.coco = coco
        sys.modules["pycocotools"] = pkg
        sys.modules["pycocotools.coco"] = coco
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        from datasets.coco_data import COCO_data_pipeline  # noqa: E402
    return COCO_data_pipeline


def _joints17(rng, n, vprobs=(0.3, 0.4, 0.3)):
    j = np.zeros((n, 17, 3), np.float64)
    j[:, :, 0] = rng.uniform(-10, 500, (n, 17))
    j[:, :, 1] = rng.uniform(-10, 400, (n, 17))
    j[:, :, 2] = rng.choice([0.0, 1.0, 2.0], (n, 17), p=vprobs)
    return j


@pytest.mark.parametrize("seed", range(5))
def test_add_neck_matches_reference(seed):
    mod = _ref_pipeline()
    rng = np.random.RandomState(seed)
    n_other = rng.randint(1, 4)
    j = _joints17(rng, 1 + n_other)
    # hit every visibility-rule branch across seeds: force shoulder combos
    j[0, 5, 2], j[0, 6, 2] = [(0, 0), (1, 0), (2, 1), (1, 1), (0, 2)][seed]

    meta = {"joint_self": j[0].copy(), "numOtherPeople": n_other,
            "joint_others": j[1:].copy()}
    meta = mod.Cocokeypoints.add_neck(None, meta)

    ours = add_neck(j)  # (P, 18, 3) float32
    np.testing.assert_array_equal(ours[0], meta["joint_self"].astype(np.float32))
    np.testing.assert_array_equal(ours[1:], meta["joint_others"].astype(np.float32))


@pytest.mark.parametrize("seed", range(3))
def test_remove_illegal_joint_matches_reference(seed):
    mod = _ref_pipeline()
    crop = 128
    mod.params_transform["crop_size_x"] = crop
    mod.params_transform["crop_size_y"] = crop
    rng = np.random.RandomState(seed)
    j = np.zeros((3, 18, 3), np.float64)
    j[:, :, 0] = rng.uniform(-40, crop + 40, (3, 18))
    j[:, :, 1] = rng.uniform(-40, crop + 40, (3, 18))
    j[:, :, 2] = rng.choice([0.0, 1.0, 2.0], (3, 18))

    meta = {"joint_self": j[0].copy(), "numOtherPeople": 2,
            "joint_others": j[1:].copy()}
    meta = mod.Cocokeypoints.remove_illegal_joint(None, meta)

    ours = remove_illegal_joints(j.copy(), crop)
    np.testing.assert_array_equal(ours[0], meta["joint_self"])
    np.testing.assert_array_equal(ours[1:], meta["joint_others"])


@pytest.mark.parametrize("seed", range(4))
def test_bbox_extents_match_reference(seed):
    """Cocobbox.get_ground_truth (COCO_data_pipeline.py:382-405): GT boxes
    from post-augmentation mask extents, crowds skipped, empty masks ->
    -1 rows.  Ours: data/augment.boxes_from_masks."""
    from multiposenet_tpu.data.augment import boxes_from_masks
    mod = _ref_pipeline()
    rng = np.random.RandomState(seed)
    masks, classes = [], []
    for k in range(5):
        m = np.zeros((60, 80), np.uint8)
        if k != 3:  # k==3 stays empty (cropped-out instance)
            x, y = rng.randint(0, 70), rng.randint(0, 50)
            m[y: y + rng.randint(1, 10), x: x + rng.randint(1, 10)] = 1
        masks.append(m)
        classes.append(-1 if k == 1 else 0)
    meta = {"instance_mask_list": [m.copy() for m in masks],
            "instance_cls_list": list(classes)}
    info = {"anns": [{"iscrowd": 1 if c == -1 else 0} for c in classes]}
    ref = np.array(mod.Cocobbox.get_ground_truth(None, meta, info),
                   np.float32)
    ours = boxes_from_masks(masks, classes)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("seed", [0, 1])
def test_get_ground_truth_matches_reference(seed):
    mod = _ref_pipeline()
    crop, stride = 64, 4
    mod.params_transform["crop_size_x"] = crop
    mod.params_transform["crop_size_y"] = crop
    mod.params_transform["stride"] = stride
    rng = np.random.RandomState(seed)
    j = np.zeros((3, 18, 3), np.float64)
    j[:, :, 0] = rng.uniform(-8, crop + 8, (3, 18))
    j[:, :, 1] = rng.uniform(-8, crop + 8, (3, 18))
    j[:, :, 2] = rng.choice([0.0, 1.0, 2.0], (3, 18))
    j[1, 0] = j[0, 0] * [1, 1, 0]  # overlap -> exercises the 1.0 clip
    mask_miss = (rng.rand(crop, crop) > 0.15).astype(np.uint8) * 255

    meta = {"joint_self": j[0].copy(), "numOtherPeople": 2,
            "joint_others": j[1:].copy()}
    heat_mask, heatmaps = mod.Cocokeypoints.get_ground_truth(
        None, meta, mask_miss.copy())

    # ours: KeypointDataset's mask recipe (datasets.py:149-150) + the
    # vectorized target generator
    ours_mask = cv2.resize(mask_miss, (0, 0), fx=1.0 / stride,
                           fy=1.0 / stride,
                           interpolation=cv2.INTER_CUBIC
                           ).astype(np.float32) / 255.0
    ours_heat = make_heatmaps_np(j, crop // stride, crop // stride,
                                 stride, 7.0)

    assert heat_mask.shape == (crop // stride, crop // stride, 18)
    np.testing.assert_array_equal(
        heat_mask, np.repeat(ours_mask[:, :, None], 18, axis=2))
    np.testing.assert_allclose(ours_heat, heatmaps, atol=3e-6)
    assert (heatmaps >= 1.0).any()  # the clip fired (test has teeth)
