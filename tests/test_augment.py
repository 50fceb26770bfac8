"""Augmentation property tests: joints must track image pixels exactly."""

import dataclasses

import cv2
import numpy as np

from multiposenet_tpu.config import DataConfig
from multiposenet_tpu.data.augment import (
    FLIP_ORDER_18,
    KeypointSample,
    aug_croppad,
    aug_flip,
    aug_rotate,
    aug_scale,
    augment_keypoint_sample,
)


def _sample(size=200, dot=(120.0, 80.0)):
    img = np.zeros((size, size, 3), np.uint8)
    cv2.circle(img, (int(dot[0]), int(dot[1])), 3, (255, 255, 255), -1)
    joints = np.full((1, 18, 3), 2.0, np.float32)
    joints[0, 0] = [dot[0], dot[1], 1.0]
    return KeypointSample(
        img=img, mask_miss=np.full((size, size), 255, np.uint8),
        joints=joints, objpos=np.array([100.0, 100.0]), scale_provided=0.6)


def _dot_center(img):
    ys, xs = np.where(img[:, :, 0] > 200)
    return xs.mean(), ys.mean()


class _FixedRng:
    """Deterministic 'random' stream."""

    def __init__(self, vals):
        self.vals = list(vals)

    def random(self):
        return self.vals.pop(0)


def test_scale_tracks_pixels():
    cfg = DataConfig(inp_size=128)
    s = _sample()
    s = aug_scale(s, cfg, _FixedRng([0.0, 0.5]))  # mult = 1.0
    # scale = target_dist/scale_provided * 1.0 = 1.0 exactly
    cx, cy = _dot_center(s.img)
    assert abs(cx - s.joints[0, 0, 0]) < 1.5
    assert abs(cy - s.joints[0, 0, 1]) < 1.5


def test_rotate_tracks_pixels():
    cfg = DataConfig(inp_size=128, max_rotate_degree=40.0)
    s = _sample()
    s = aug_rotate(s, cfg, _FixedRng([0.9]))  # +32 degrees
    cx, cy = _dot_center(s.img)
    assert abs(cx - s.joints[0, 0, 0]) < 1.5, (cx, s.joints[0, 0])
    assert abs(cy - s.joints[0, 0, 1]) < 1.5
    # mask border fill is 255 (never suppresses loss)
    assert s.mask_miss[0, 0] == 255


def test_croppad_tracks_pixels_and_marks_outside():
    cfg = DataConfig(inp_size=128, center_perturb_max=0.0)
    s = _sample()
    s.objpos = np.array([120.0, 80.0])  # center crop on the dot
    s = aug_croppad(s, cfg, _FixedRng([0.5, 0.5]))
    assert s.img.shape == (128, 128, 3)
    cx, cy = _dot_center(s.img)
    assert abs(cx - s.joints[0, 0, 0]) < 1.5
    assert abs(cy - s.joints[0, 0, 1]) < 1.5

    # a joint pushed outside the crop must get v=2
    s2 = _sample()
    s2.objpos = np.array([500.0, 500.0])
    s2 = aug_croppad(s2, cfg, _FixedRng([0.5, 0.5]))
    assert s2.joints[0, 0, 2] == 2.0


def test_flip_tracks_pixels_and_swaps_joints():
    cfg = DataConfig(inp_size=128, flip_prob=1.0)
    s = _sample()
    s.joints[0, 2] = [30.0, 40.0, 1.0]   # right shoulder
    s.joints[0, 5] = [60.0, 40.0, 1.0]   # left shoulder
    w = s.img.shape[1]
    s = aug_flip(s, cfg, _FixedRng([0.0]))
    cx, cy = _dot_center(s.img)
    assert abs(cx - s.joints[0, 0, 0]) < 1.5
    # L/R swap: new right shoulder = mirrored old left shoulder
    np.testing.assert_allclose(s.joints[0, 2, :2], [w - 1 - 60.0, 40.0])
    np.testing.assert_allclose(s.joints[0, 5, :2], [w - 1 - 30.0, 40.0])


def test_full_chain_keeps_joint_on_pixel():
    cfg = DataConfig(inp_size=128)
    rng = np.random.default_rng(42)
    checked = 0
    for trial in range(8):
        s = _sample(dot=(float(rng.uniform(60, 140)), float(rng.uniform(60, 140))))
        s.objpos = s.joints[0, 0, :2].astype(np.float64).copy()
        s = augment_keypoint_sample(s, cfg, rng)
        if s.joints[0, 0, 2] > 1:  # rotated/cropped out
            continue
        if not (s.img[:, :, 0] > 200).any():
            continue
        cx, cy = _dot_center(s.img)
        # interpolation spreads the dot; allow 2px
        assert abs(cx - s.joints[0, 0, 0]) < 2.5
        assert abs(cy - s.joints[0, 0, 1]) < 2.5
        checked += 1
    # the crop is centered on the dot, so most trials must actually verify
    # (this guards against the dot silently landing outside every crop)
    assert checked >= 4, checked
