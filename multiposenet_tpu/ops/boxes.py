"""Box transforms and IoU — pure jnp, fully batched.

Mirrors reference network/utils.py (BBoxTransform/ClipBoxes) and
network/losses.py:5-22 (calc_iou).  Note the reference uses TWO IoU
conventions: standard IoU inside the focal loss, and a +1-pixel convention
inside native NMS (reference lib/nms/src/nms.c:55-58).  Both are provided.
"""

from __future__ import annotations

import jax.numpy as jnp

BBOX_STD = jnp.asarray([0.1, 0.1, 0.2, 0.2], dtype=jnp.float32)


def decode_boxes(anchors: jnp.ndarray, deltas: jnp.ndarray,
                 std=BBOX_STD) -> jnp.ndarray:
    """Decode regression deltas against anchors -> x1y1x2y2.

    anchors: (..., A, 4) x1y1x2y2; deltas: (..., A, 4) normalized (dx,dy,dw,dh).
    Reference network/utils.py:19-43.
    """
    widths = anchors[..., 2] - anchors[..., 0]
    heights = anchors[..., 3] - anchors[..., 1]
    ctr_x = anchors[..., 0] + 0.5 * widths
    ctr_y = anchors[..., 1] + 0.5 * heights

    dx = deltas[..., 0] * std[0]
    dy = deltas[..., 1] * std[1]
    dw = deltas[..., 2] * std[2]
    dh = deltas[..., 3] * std[3]

    pred_ctr_x = ctr_x + dx * widths
    pred_ctr_y = ctr_y + dy * heights
    pred_w = jnp.exp(dw) * widths
    pred_h = jnp.exp(dh) * heights

    return jnp.stack(
        [pred_ctr_x - 0.5 * pred_w, pred_ctr_y - 0.5 * pred_h,
         pred_ctr_x + 0.5 * pred_w, pred_ctr_y + 0.5 * pred_h],
        axis=-1,
    )


def encode_boxes(anchors: jnp.ndarray, gt: jnp.ndarray, std=BBOX_STD) -> jnp.ndarray:
    """Encode gt boxes against anchors (the focal-loss regression target).

    Widths/heights of gt are clamped to >= 1 (reference losses.py:112-113).
    """
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = anchors[..., 0] + 0.5 * aw
    ay = anchors[..., 1] + 0.5 * ah

    gw = jnp.clip(gt[..., 2] - gt[..., 0], 1.0, None)
    gh = jnp.clip(gt[..., 3] - gt[..., 1], 1.0, None)
    gx = gt[..., 0] + 0.5 * (gt[..., 2] - gt[..., 0])
    gy = gt[..., 1] + 0.5 * (gt[..., 3] - gt[..., 1])

    t = jnp.stack(
        [(gx - ax) / aw, (gy - ay) / ah, jnp.log(gw / aw), jnp.log(gh / ah)],
        axis=-1,
    )
    return t / std


def clip_boxes(boxes: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Clamp x1,y1 to >=0 and x2,y2 to <= width/height (reference utils.py:51-61)."""
    x1 = jnp.clip(boxes[..., 0], 0.0, None)
    y1 = jnp.clip(boxes[..., 1], 0.0, None)
    x2 = jnp.clip(boxes[..., 2], None, float(width))
    y2 = jnp.clip(boxes[..., 3], None, float(height))
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Standard IoU matrix (N,4)x(M,4)->(N,M). Reference losses.py:5-22."""
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    iw = jnp.minimum(a[:, None, 2], b[None, :, 2]) - jnp.maximum(a[:, None, 0], b[None, :, 0])
    ih = jnp.minimum(a[:, None, 3], b[None, :, 3]) - jnp.maximum(a[:, None, 1], b[None, :, 1])
    iw = jnp.clip(iw, 0.0, None)
    ih = jnp.clip(ih, 0.0, None)
    inter = iw * ih
    union = jnp.clip(area_a[:, None] + area_b[None, :] - inter, 1e-8, None)
    return inter / union


def box_iou_plus1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix with the legacy +1-pixel convention used by the reference's
    native NMS kernels (reference lib/nms/src/nms.c:55-58, nms_kernel.cu:16-24).
    """
    area_a = (a[:, 2] - a[:, 0] + 1.0) * (a[:, 3] - a[:, 1] + 1.0)
    area_b = (b[:, 2] - b[:, 0] + 1.0) * (b[:, 3] - b[:, 1] + 1.0)
    iw = jnp.minimum(a[:, None, 2], b[None, :, 2]) - jnp.maximum(a[:, None, 0], b[None, :, 0]) + 1.0
    ih = jnp.minimum(a[:, None, 3], b[None, :, 3]) - jnp.maximum(a[:, None, 1], b[None, :, 1]) + 1.0
    inter = jnp.clip(iw, 0.0, None) * jnp.clip(ih, 0.0, None)
    return inter / (area_a[:, None] + area_b[None, :] - inter)
