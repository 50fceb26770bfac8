"""Host-side image augmentation for the keypoint and detection pipelines.

Same transform semantics as the reference (datasets/coco_data/
ImageAugmentation.py:25-340): scale -> rotate -> crop/pad -> flip, with the
keypoint variant carrying (joints, mask_miss) and the detection variant
carrying instance-mask lists.  Differences from the reference are
engineering, not behavior:

- randomness comes from an explicit np.random.Generator (reproducible,
  worker-safe) instead of the global `random` module;
- joints are a single (P, 18, 3) array covering self+others rather than the
  reference's joint_self/joint_others split — identical math applied to all.

Constants (COCO_data_pipeline.py:25-40): scale in [0.8, 1.2] * target_dist
0.6 / scale_provided, rotation +/-40 deg, center perturbation +/-40 px, flip
p=0.3, pad values img 128 / mask_miss 255 / instance masks 0.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import cv2
import numpy as np

from multiposenet_tpu.config import DataConfig

# L/R joint swap for horizontal flip, 18-joint internal order
# (reference ImageAugmentation.py:148-149)
FLIP_ORDER_18 = [0, 1, 5, 6, 7, 2, 3, 4, 11, 12, 13, 8, 9, 10, 15, 14, 17, 16]


@dataclasses.dataclass
class KeypointSample:
    """Mutable working record for one keypoint training sample."""
    img: np.ndarray            # (H, W, 3) uint8 BGR (cv2 layout)
    mask_miss: np.ndarray      # (H, W) uint8
    joints: np.ndarray         # (P, 18, 3) float; row 0 is the 'self' person
    objpos: np.ndarray         # (2,) float, self person center
    scale_provided: float


def aug_scale(s: KeypointSample, cfg: DataConfig, rng: np.random.Generator):
    if rng.random() > cfg.scale_prob:
        mult = 1.0
    else:
        mult = (cfg.scale_max - cfg.scale_min) * rng.random() + cfg.scale_min
    scale = cfg.target_dist / s.scale_provided * mult
    s.img = cv2.resize(s.img, (0, 0), fx=scale, fy=scale,
                       interpolation=cv2.INTER_CUBIC)
    s.mask_miss = cv2.resize(s.mask_miss, (0, 0), fx=scale, fy=scale,
                             interpolation=cv2.INTER_CUBIC)
    s.objpos = s.objpos * scale
    s.joints[:, :, :2] *= scale
    return s


def _rotate_bound(image: np.ndarray, angle: float, border_value
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Rotate keeping the whole image in frame (reference ImageAugmentation.py:179-201)."""
    h, w = image.shape[:2]
    cx, cy = w // 2, h // 2
    m = cv2.getRotationMatrix2D((cx, cy), -angle, 1.0)
    cos, sin = abs(m[0, 0]), abs(m[0, 1])
    nw = int(h * sin + w * cos)
    nh = int(h * cos + w * sin)
    m[0, 2] += nw / 2 - cx
    m[1, 2] += nh / 2 - cy
    out = cv2.warpAffine(image, m, (nw, nh), flags=cv2.INTER_CUBIC,
                         borderMode=cv2.BORDER_CONSTANT, borderValue=border_value)
    return out, m


def aug_rotate(s: KeypointSample, cfg: DataConfig, rng: np.random.Generator):
    degree = (rng.random() - 0.5) * 2 * cfg.max_rotate_degree
    s.img, m = _rotate_bound(s.img, degree, (128, 128, 128))
    s.mask_miss, _ = _rotate_bound(s.mask_miss, degree, 255)
    pts = np.concatenate([s.objpos[None], s.joints[:, :, :2].reshape(-1, 2)])
    rot = pts @ m[:, :2].T + m[:, 2]
    s.objpos = rot[0]
    s.joints[:, :, :2] = rot[1:].reshape(s.joints.shape[0], -1, 2)
    return s


def aug_croppad(s: KeypointSample, cfg: DataConfig, rng: np.random.Generator):
    crop = cfg.inp_size
    x_off = int((rng.random() - 0.5) * 2 * cfg.center_perturb_max)
    y_off = int((rng.random() - 0.5) * 2 * cfg.center_perturb_max)
    center = (s.objpos + np.array([x_off, y_off])).astype(int)

    # pad by a full crop on each side then slice (reference style)
    img = np.pad(s.img, ((crop, crop), (crop, crop), (0, 0)),
                 constant_values=128)
    mm = np.pad(s.mask_miss, ((crop, crop), (crop, crop)),
                constant_values=255)
    y0 = center[1] + crop // 2
    x0 = center[0] + crop // 2
    # padded row `crop` is original row 0, so the reference's slice
    # [center + crop//2, center + crop//2 + crop) covers original rows
    # [center - crop//2, center + crop//2) — centered on `center`
    s.img = img[y0: y0 + crop, x0: x0 + crop]
    # reference slices mask with crop+1 rows/cols (COCO_data_pipeline quirk:
    # aug_croppad mask_miss slice has +1) then resizes; we keep exact crop --
    # the resize to stride grid swallows the off-by-one.  When flip fires
    # the reference's crop+1 columns reverse, shifting its mask content one
    # pixel right of ours (ours == its columns 1..crop) — same quirk class,
    # pinned exactly by tests/test_reference_augment_parity.py.
    s.mask_miss = mm[y0: y0 + crop, x0: x0 + crop]

    offset = np.array([crop / 2 - center[0], crop / 2 - center[1]])
    s.objpos = s.objpos + offset
    s.joints[:, :, :2] += offset
    out = ((s.joints[:, :, 0] >= crop) | (s.joints[:, :, 0] < 0) |
           (s.joints[:, :, 1] >= crop) | (s.joints[:, :, 1] < 0))
    s.joints[out, 2] = 2
    return s


def aug_flip(s: KeypointSample, cfg: DataConfig, rng: np.random.Generator):
    if rng.random() > cfg.flip_prob:
        return s
    s.img = s.img[:, ::-1].copy()
    s.mask_miss = s.mask_miss[:, ::-1].copy()
    w = s.img.shape[1]
    s.objpos[0] = w - 1 - s.objpos[0]
    s.joints[:, :, 0] = w - 1 - s.joints[:, :, 0]
    s.joints = s.joints[:, FLIP_ORDER_18, :]
    return s


def augment_keypoint_sample(s: KeypointSample, cfg: DataConfig,
                            rng: np.random.Generator) -> KeypointSample:
    for fn in (aug_scale, aug_rotate, aug_croppad, aug_flip):
        s = fn(s, cfg, rng)
    return s


def remove_illegal_joints(joints: np.ndarray, crop: int) -> np.ndarray:
    """Joints outside the crop become (1, 1, 2)
    (reference COCO_data_pipeline.py:176-194)."""
    out = ((joints[:, :, 0] >= crop) | (joints[:, :, 0] < 0) |
           (joints[:, :, 1] >= crop) | (joints[:, :, 1] < 0))
    joints = joints.copy()
    joints[out] = (1.0, 1.0, 2.0)
    return joints


# ---------------------------------------------------------------------------
# detection variant: image + list of instance masks
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class BBoxSample:
    img: np.ndarray                 # (H, W, 3) uint8 BGR
    masks: List[np.ndarray]         # instance masks, uint8
    classes: List[int]              # 0 person / -1 crowd
    objpos: np.ndarray
    scale_provided: float


def augment_bbox_sample(s: BBoxSample, cfg: DataConfig,
                        rng: np.random.Generator) -> BBoxSample:
    # scale (reference aug_scale_bbox:234-259; masks use INTER_AREA)
    if rng.random() > cfg.scale_prob:
        mult = 1.0
    else:
        mult = (cfg.scale_max - cfg.scale_min) * rng.random() + cfg.scale_min
    scale = cfg.target_dist / s.scale_provided * mult
    s.img = cv2.resize(s.img, (0, 0), fx=scale, fy=scale,
                       interpolation=cv2.INTER_CUBIC)
    s.masks = [cv2.resize(m, (0, 0), fx=scale, fy=scale,
                          interpolation=cv2.INTER_AREA) for m in s.masks]
    s.objpos = s.objpos * scale

    # rotate (aug_rotate_bbox:328-340; mask border 0)
    degree = (rng.random() - 0.5) * 2 * cfg.max_rotate_degree
    s.img, _ = _rotate_bound(s.img, degree, (128, 128, 128))
    s.masks = [_rotate_bound(m, degree, 0)[0] for m in s.masks]

    # croppad (aug_croppad_bbox:262-310)
    crop = cfg.inp_size
    x_off = int((rng.random() - 0.5) * 2 * cfg.center_perturb_max)
    y_off = int((rng.random() - 0.5) * 2 * cfg.center_perturb_max)
    center = (s.objpos + np.array([x_off, y_off])).astype(int)
    img = np.pad(s.img, ((crop, crop), (crop, crop), (0, 0)), constant_values=128)
    y0 = center[1] + crop // 2
    x0 = center[0] + crop // 2
    s.img = img[y0: y0 + crop, x0: x0 + crop]
    new_masks = []
    for m in s.masks:
        mp = np.pad(m, ((crop, crop), (crop, crop)), constant_values=0)
        # reference keeps the +1 slice for masks; bbox extents are identical
        new_masks.append(mp[y0: y0 + crop + 1, x0: x0 + crop + 1])
    s.masks = new_masks

    # flip (aug_flip_bbox:313-325)
    if rng.random() <= cfg.flip_prob:
        s.img = s.img[:, ::-1].copy()
        s.masks = [m[:, ::-1].copy() for m in s.masks]
    return s


def boxes_from_masks(masks: List[np.ndarray], classes: List[int]) -> np.ndarray:
    """GT boxes from post-augmentation mask extents
    (reference COCO_data_pipeline.py:382-405).  Crowds (-1) are skipped;
    empty masks yield a -1 row."""
    rows = []
    for m, c in zip(masks, classes):
        if c == -1:
            continue
        hor = np.where(m.any(axis=0))[0]
        ver = np.where(m.any(axis=1))[0]
        if hor.size:
            rows.append([hor[0], ver[0], hor[-1] + 1, ver[-1] + 1, 0])
        else:
            rows.append([-1, -1, -1, -1, -1])
    return np.asarray(rows, np.float32).reshape(-1, 5)


def pad_boxes(boxes: np.ndarray, max_n: int) -> np.ndarray:
    """Pad to (max_n, 5) with -1 (reference bbox_collater,
    COCO_data_pipeline.py:444-457)."""
    out = np.full((max_n, 5), -1.0, np.float32)
    n = min(len(boxes), max_n)
    if n:
        out[:n] = boxes[:n]
    return out
