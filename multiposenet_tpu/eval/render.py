"""Skeleton / bbox rendering.

Output-parity target: the reference's visualizer
(network/joint_utils.py:155-202) — red bbox rectangles, per-joint colored
dots, and elliptical limb "sticks".  The color table and limb topology are
protocol constants and must match; the drawing itself is restructured here:
all limb geometry (endpoints, midpoints, lengths, angles) is computed as
batched numpy array math over the whole skeleton, and the cv2 primitives are
emitted from those precomputed tables.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import cv2
import numpy as np

COLORS = [
    [255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 255, 0], [170, 255, 0],
    [85, 255, 0], [0, 255, 0], [0, 255, 85], [0, 255, 170], [0, 255, 255],
    [0, 170, 255], [0, 85, 255], [0, 0, 255], [85, 0, 255], [170, 0, 255],
    [255, 0, 255], [255, 0, 170], [255, 0, 85], [255, 0, 0]]
# limbs over the 17-joint internal order (reference joint_utils.py:14-15)
LIMB_SEQ = np.array(
    [[0, 1], [1, 2], [2, 3], [0, 4], [4, 5], [5, 6], [0, 7], [7, 8],
     [8, 9], [0, 10], [10, 11], [11, 12], [0, 13], [13, 15], [0, 14],
     [14, 16]], dtype=np.int64)

_JOINT_RADIUS = 4
_STICK_HALFWIDTH = 2
_BBOX_COLOR = (0, 0, 255)  # BGR red


def draw_person(canvas: np.ndarray, joints: Sequence[Sequence[float]],
                bbox: Sequence[float]) -> np.ndarray:
    """Draw one person's bbox, joints and limb sticks onto ``canvas``."""
    j = np.asarray(joints, dtype=np.float64).reshape(17, 3)
    xy = j[:, :2].astype(np.int64)
    # Dot visibility via int-truncation like the reference's dot check
    # (joint_utils.py:164 ``int(joints[i][2]) == 0`` skips): a fractional
    # v in (0, 1) counts as NOT visible for dots.  The reference's LIMB
    # check is a float compare (``joints[a][2] == 0`` skips), so limbs use
    # the un-truncated mask — for fractional v the reference draws the
    # limb but not the dot, and so do we.  In-protocol v is always exactly
    # 0 or 1, where the two masks agree.
    visible = j[:, 2].astype(np.int64) != 0
    limb_visible = j[:, 2] != 0

    bx, by, bw, bh = (float(v) for v in bbox[:4])
    cv2.rectangle(canvas, (int(bx), int(by)), (int(bx + bw), int(by + bh)),
                  color=_BBOX_COLOR, thickness=2)

    for idx in np.flatnonzero(visible):
        cv2.circle(canvas, tuple(xy[idx]), _JOINT_RADIUS, COLORS[idx],
                   thickness=-1)

    # Batched stick geometry: endpoints (L,2,2), then midpoint / length /
    # angle for every limb at once.  The reference computes these one limb
    # at a time inside its loop; here the loop only rasterizes.
    ends = xy[LIMB_SEQ]                         # (16, 2, 2) int endpoints
    limb_ok = limb_visible[LIMB_SEQ].all(axis=1)  # both endpoints visible
    mids = ends.astype(np.float64).mean(axis=1)  # (16, 2)
    deltas = (ends[:, 0] - ends[:, 1]).astype(np.float64)
    half_lens = np.hypot(deltas[:, 0], deltas[:, 1]) / 2.0
    angles = np.degrees(np.arctan2(deltas[:, 1], deltas[:, 0]))

    for idx in np.flatnonzero(limb_ok):
        poly = cv2.ellipse2Poly(
            (int(mids[idx, 0]), int(mids[idx, 1])),
            (int(half_lens[idx]), _STICK_HALFWIDTH),
            int(angles[idx]), 0, 360, 1)
        cv2.fillConvexPoly(canvas, poly, COLORS[idx])
    return canvas


def plot_results(img: np.ndarray, results: List[Dict]) -> np.ndarray:
    """Render a list of COCO-format person results onto ``img``."""
    for person in results:
        kp = np.asarray(person["keypoints"], dtype=np.float64).reshape(17, 3)
        img = draw_person(img, kp, person["bbox"])
    return img
