"""Skeleton / bbox rendering (reference network/joint_utils.py:155-202)."""

from __future__ import annotations

import math
from typing import Dict, List, Sequence

import cv2
import numpy as np

COLORS = [
    [255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 255, 0], [170, 255, 0],
    [85, 255, 0], [0, 255, 0], [0, 255, 85], [0, 255, 170], [0, 255, 255],
    [0, 170, 255], [0, 85, 255], [0, 0, 255], [85, 0, 255], [170, 0, 255],
    [255, 0, 255], [255, 0, 170], [255, 0, 85], [255, 0, 0]]
# limbs over the 17-joint internal order (reference joint_utils.py:14-15)
LIMB_SEQ = [[0, 1], [1, 2], [2, 3], [0, 4], [4, 5], [5, 6], [0, 7], [7, 8],
            [8, 9], [0, 10], [10, 11], [11, 12], [0, 13], [13, 15], [0, 14],
            [14, 16]]


def draw_person(canvas: np.ndarray, joints: Sequence[Sequence[float]],
                bbox: Sequence[float]) -> np.ndarray:
    x1, y1 = int(bbox[0]), int(bbox[1])
    x2, y2 = int(bbox[0] + bbox[2]), int(bbox[1] + bbox[3])
    cv2.rectangle(canvas, (x1, y1), (x2, y2), color=(0, 0, 255), thickness=2)

    for i in range(17):
        if int(joints[i][2]) == 0:
            continue
        cv2.circle(canvas, (int(joints[i][0]), int(joints[i][1])), 4,
                   COLORS[i], thickness=-1)

    for i in range(16):
        a, b = LIMB_SEQ[i]
        if joints[a][2] == 0 or joints[b][2] == 0:
            continue
        xs = (int(joints[a][0]), int(joints[b][0]))
        ys = (int(joints[a][1]), int(joints[b][1]))
        mx, my = np.mean(xs), np.mean(ys)
        length = ((xs[0] - xs[1]) ** 2 + (ys[0] - ys[1]) ** 2) ** 0.5
        angle = math.degrees(math.atan2(ys[0] - ys[1], xs[0] - xs[1]))
        poly = cv2.ellipse2Poly((int(mx), int(my)), (int(length / 2), 2),
                                int(angle), 0, 360, 1)
        cv2.fillConvexPoly(canvas, poly, COLORS[i])
    return canvas


def plot_results(img: np.ndarray, results: List[Dict]) -> np.ndarray:
    for person in results:
        kp = person["keypoints"]
        joints = [[kp[3 * i], kp[3 * i + 1], kp[3 * i + 2]] for i in range(17)]
        img = draw_person(img, joints, person["bbox"])
    return img
