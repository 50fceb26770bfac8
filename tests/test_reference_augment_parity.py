"""Differential: data/augment.py vs the reference's ImageAugmentation.py.

The reference's augmentation module is pure numpy/cv2 driven by stdlib
``random.random()`` draws, so it runs directly as an oracle.  Both sides
consume the SAME scripted draw sequence (the draw order is identical by
construction: scale dice+dice2 at scale_prob=1, rotate dice, croppad
dice_x+dice_y, flip dice), so every geometric decision — scale factor,
rotation degree, crop offsets, flip — is pinned equal, and the outputs
must match:

- augmented image: byte-exact (same cv2 resize/warp/pad/slice/flip calls);
- mask_miss: byte-exact over the crop region (the reference keeps a +1
  row/col slice — documented deviation, data/augment.py:103-106);
- joints/objpos: 1e-9 (affine applied as one matmul vs per-point dots);
- visibility flags and the L/R flip joint reorder: exact.

Covers the keypoint variant (self + others, flip taken and not taken) and
the detection variant (instance-mask lists, +1 mask slices preserved).
Reference: datasets/coco_data/ImageAugmentation.py:25-340.
"""

import random as stdlib_random

import numpy as np
import pytest

from multiposenet_tpu.config import DataConfig
from multiposenet_tpu.data.augment import (
    BBoxSample,
    KeypointSample,
    augment_bbox_sample,
    augment_keypoint_sample,
)

from tests.reference_oracle import import_reference_augmentation


class ScriptedRng:
    """Replays a fixed draw list through the np.random.Generator API
    surface data/augment.py uses (.random() only)."""

    def __init__(self, draws):
        self._it = iter(draws)

    def random(self):
        return next(self._it)


class ScriptedStdRandom:
    """Same, shaped like the stdlib `random` module for the reference."""

    def __init__(self, draws):
        self._it = iter(draws)
        self.random = lambda: next(self._it)


def _cfg(inp_size=128):
    # reference keypoint params (COCO_data_pipeline.py:25-40)
    return DataConfig(inp_size=inp_size, target_dist=0.6, scale_prob=1.0,
                      scale_min=0.8, scale_max=1.2, max_rotate_degree=40,
                      center_perturb_max=40, flip_prob=0.3)


def _inputs(seed, n_other=2, h=96, w=120):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w, 3), np.uint8)
    mask_miss = (rng.rand(h, w) > 0.2).astype(np.uint8) * 255
    joints = np.zeros((1 + n_other, 18, 3), np.float64)
    joints[:, :, 0] = rng.uniform(5, w - 5, (1 + n_other, 18))
    joints[:, :, 1] = rng.uniform(5, h - 5, (1 + n_other, 18))
    joints[:, :, 2] = rng.choice([0.0, 1.0, 2.0], (1 + n_other, 18))
    objpos = np.array([w / 2 + rng.uniform(-10, 10),
                       h / 2 + rng.uniform(-10, 10)])
    scale_provided = float(rng.uniform(0.4, 0.9))
    return img, mask_miss, joints, objpos, scale_provided


def _ref_params(cfg):
    return {
        "scale_prob": cfg.scale_prob, "scale_min": cfg.scale_min,
        "scale_max": cfg.scale_max, "target_dist": cfg.target_dist,
        "max_rotate_degree": cfg.max_rotate_degree,
        "center_perterb_max": cfg.center_perturb_max,
        "crop_size_x": cfg.inp_size, "crop_size_y": cfg.inp_size,
        "flip_prob": cfg.flip_prob, "mode": 5,
    }


def _draws(seed, n, force_flip=None):
    r = stdlib_random.Random(seed)
    d = [r.random() for _ in range(n)]
    if force_flip is not None:
        d[-1] = 0.05 if force_flip else 0.95  # flip dice vs flip_prob 0.3
    return d


@pytest.mark.parametrize("seed,n_other,flip", [
    (0, 2, True), (1, 2, False), (2, 0, True), (3, 3, False), (4, 1, True),
])
def test_keypoint_augment_matches_reference(seed, n_other, flip):
    ref_aug = import_reference_augmentation()
    cfg = _cfg()
    img, mask_miss, joints, objpos, scale_provided = _inputs(seed, n_other)
    draws = _draws(seed, 6, force_flip=flip)

    # ---- reference chain (scale -> rotate -> croppad -> flip) ----
    meta = {
        "objpos": objpos.copy(),
        "joint_self": joints[0].copy(),
        "numOtherPeople": n_other,
        "objpos_other": np.tile(objpos, (n_other, 1)) if n_other else
        np.zeros((0, 2)),
        "joint_others": joints[1:].copy(),
        "scale_provided": scale_provided,
    }
    params = _ref_params(cfg)
    orig_random = ref_aug.random
    ref_aug.random = ScriptedStdRandom(list(draws))
    try:
        meta, r_img, r_mask = ref_aug.aug_scale(
            meta, img.copy(), mask_miss.copy(), params)
        meta, r_img, r_mask = ref_aug.aug_rotate(meta, r_img, r_mask, params)
        meta, r_img, r_mask = ref_aug.aug_croppad(meta, r_img, r_mask, params)
        meta, r_img, r_mask = ref_aug.aug_flip(meta, r_img, r_mask, params)
    finally:
        ref_aug.random = orig_random

    # ---- our chain on the same draws ----
    s = KeypointSample(img=img.copy(), mask_miss=mask_miss.copy(),
                       joints=joints.copy(), objpos=objpos.copy(),
                       scale_provided=scale_provided)
    s = augment_keypoint_sample(s, cfg, ScriptedRng(list(draws)))

    crop = cfg.inp_size
    np.testing.assert_array_equal(s.img, r_img)
    # The reference's croppad mask slice carries a trailing +1 row/col
    # (documented deviation, data/augment.py:103-106).  When flip fires,
    # cv2.flip reverses all crop+1 columns, so the quirk column lands at
    # index 0 and the shared content sits at columns 1..crop; unflipped,
    # the shared content is columns 0..crop-1.
    assert r_mask.shape == (crop + 1, crop + 1)
    if flip:
        np.testing.assert_array_equal(s.mask_miss, r_mask[:crop, 1:crop + 1])
    else:
        np.testing.assert_array_equal(s.mask_miss, r_mask[:crop, :crop])
    np.testing.assert_allclose(s.objpos, meta["objpos"], atol=1e-9)
    np.testing.assert_allclose(s.joints[0], meta["joint_self"], atol=1e-9)
    if n_other:
        np.testing.assert_allclose(s.joints[1:], meta["joint_others"],
                                   atol=1e-9)
    # visibility flags (croppad out-of-bounds marking + flip reorder) exact
    np.testing.assert_array_equal(s.joints[0, :, 2], meta["joint_self"][:, 2])


@pytest.mark.parametrize("seed,flip", [(10, True), (11, False), (12, True)])
def test_bbox_augment_matches_reference(seed, flip):
    ref_aug = import_reference_augmentation()
    cfg = _cfg()
    img, _, _, objpos, scale_provided = _inputs(seed, 0)
    rng = np.random.RandomState(seed + 500)
    masks = [(rng.rand(img.shape[0], img.shape[1]) > t).astype(np.uint8)
             for t in (0.6, 0.8, 0.95)]
    draws = _draws(seed, 6, force_flip=flip)

    meta = {"objpos": objpos.copy(), "scale_provided": scale_provided,
            "instance_mask_list": [m.copy() for m in masks]}
    params = _ref_params(cfg)
    orig_random = ref_aug.random
    ref_aug.random = ScriptedStdRandom(list(draws))
    try:
        meta, r_img = ref_aug.aug_scale_bbox(meta, img.copy(), params)
        meta, r_img = ref_aug.aug_rotate_bbox(meta, r_img, params)
        meta, r_img = ref_aug.aug_croppad_bbox(meta, r_img, params)
        meta, r_img = ref_aug.aug_flip_bbox(meta, r_img, params)
    finally:
        ref_aug.random = orig_random

    s = BBoxSample(img=img.copy(), masks=[m.copy() for m in masks],
                   classes=[0, 0, -1], objpos=objpos.copy(),
                   scale_provided=scale_provided)
    s = augment_bbox_sample(s, cfg, ScriptedRng(list(draws)))

    np.testing.assert_array_equal(s.img, r_img)
    assert len(s.masks) == len(meta["instance_mask_list"])
    for ours, ref in zip(s.masks, meta["instance_mask_list"]):
        np.testing.assert_array_equal(ours, ref)
