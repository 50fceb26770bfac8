"""Loss functions — masked-MSE keypoint loss, RetinaNet focal loss, PRN BCE.

The reference's FocalLoss loops over the batch in Python on dynamic tensors
(reference network/losses.py:41-137).  Here everything is a fixed-shape
vmapped computation: GT boxes arrive padded to (B, N, 5) with -1 (matching
the reference bbox_collater, datasets/coco_data/COCO_data_pipeline.py:444-457)
and the padding is masked out arithmetically.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from multiposenet_tpu.ops.boxes import box_iou, encode_boxes


def _at_least_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Pin reduced-precision activations (bfloat16) up to float32 WITHOUT
    downcasting higher precision: losses stay parity-exact under bf16
    compute, and float64 runs (the oracle's strict gradient-identity
    tests) keep full precision end-to-end."""
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))


# --------------------------------------------------------------------------
# Keypoint subnet: 5-term masked MSE (reference network/posenet.py:367-403)
# --------------------------------------------------------------------------

def keypoint_loss(
    saved_for_loss: Sequence[jnp.ndarray],
    heat_target: jnp.ndarray,
    heat_mask: jnp.ndarray,
    num_joints: int = 18,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Masked MSE over 4 intermediate heads + the final head.

    Args:
      saved_for_loss: list of 5 NHWC tensors, channels >= num_joints
        (intermediate convfin_k* emit 19ch; only :18 enter the loss,
        reference posenet.py:378).
      heat_target: (B, H, W, num_joints) gaussian targets.
      heat_mask:   (B, H, W, num_joints) mask_miss weights.
    """
    names = ["heatmap_loss_k2", "heatmap_loss_k3", "heatmap_loss_k4",
             "heatmap_loss_k5", "heatmap_loss"]
    logs = {}
    total = jnp.asarray(0.0, jnp.float32)
    gt = _at_least_f32(heat_mask * heat_target)
    for name, out in zip(names, saved_for_loss):
        pred = _at_least_f32(out[..., :num_joints]) * heat_mask
        loss = jnp.mean(jnp.square(pred - gt))
        logs[name] = loss
        total = total + loss
    final = saved_for_loss[-1][..., :num_joints]
    logs["max_ht"] = jnp.max(final)
    logs["min_ht"] = jnp.min(final)
    return total, logs


# --------------------------------------------------------------------------
# Detection subnet: focal + smooth-L1 (reference network/losses.py:25-137)
# --------------------------------------------------------------------------

def focal_loss_single(
    classification: jnp.ndarray,  # (A, C) sigmoid probabilities
    regression: jnp.ndarray,      # (A, 4)
    anchors: jnp.ndarray,         # (A, 4)
    annotations: jnp.ndarray,     # (N, 5) x1y1x2y2,cls padded with -1
    alpha: float = 0.25,
    gamma: float = 2.0,
    pos_iou: float = 0.5,
    neg_iou: float = 0.4,
    beta: float = 1.0 / 9.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-image focal classification loss and smooth-L1 regression loss.

    Replicates reference semantics exactly, including: ignore band
    [neg_iou, pos_iou), normalization by clamp(num_pos, 1), regression loss
    averaged over positive anchors x 4 coords, and zero losses for images
    with no GT boxes (reference losses.py:50-55).
    """
    num_anchors, num_classes = classification.shape
    ann_valid = annotations[:, 4] != -1  # (N,)
    num_valid = jnp.sum(ann_valid)

    cls = jnp.clip(_at_least_f32(classification), 1e-4, 1.0 - 1e-4)

    iou = box_iou(anchors, annotations[:, :4])          # (A, N)
    iou = jnp.where(ann_valid[None, :], iou, -1.0)      # never select padding
    iou_max = jnp.max(iou, axis=1)
    iou_argmax = jnp.argmax(iou, axis=1)

    assigned = annotations[iou_argmax]                  # (A, 5)
    positive = iou_max >= pos_iou
    negative = iou_max < neg_iou
    num_pos = jnp.sum(positive)

    # classification targets: 1 at assigned class for positives, 0 for
    # negatives AND all other channels of positives, ignored (-1) in between.
    assigned_cls = jnp.clip(assigned[:, 4].astype(jnp.int32), 0, num_classes - 1)
    one_hot = jax.nn.one_hot(assigned_cls, num_classes, dtype=jnp.float32)
    targets = jnp.where(positive[:, None], one_hot,
                        jnp.where(negative[:, None], 0.0, -1.0))

    alpha_factor = jnp.where(targets == 1.0, alpha, 1.0 - alpha)
    focal_weight = jnp.where(targets == 1.0, 1.0 - cls, cls)
    focal_weight = alpha_factor * jnp.power(focal_weight, gamma)
    bce = -(targets * jnp.log(cls) + (1.0 - targets) * jnp.log(1.0 - cls))
    cls_loss = jnp.where(targets != -1.0, focal_weight * bce, 0.0)
    cls_loss = jnp.sum(cls_loss) / jnp.clip(num_pos.astype(jnp.float32), 1.0, None)

    # regression: smooth L1 on encoded deltas of positive anchors
    reg_targets = encode_boxes(anchors, assigned[:, :4])
    diff = jnp.abs(reg_targets - _at_least_f32(regression))
    smooth = jnp.where(diff <= beta, 0.5 / beta * jnp.square(diff), diff - 0.5 * beta)
    pos_f = positive.astype(jnp.float32)[:, None]
    reg_loss = jnp.sum(smooth * pos_f) / jnp.clip(4.0 * num_pos.astype(jnp.float32), 1.0, None)
    reg_loss = jnp.where(num_pos > 0, reg_loss, 0.0)

    has_ann = num_valid > 0
    return (jnp.where(has_ann, cls_loss, 0.0), jnp.where(has_ann, reg_loss, 0.0))


def detection_loss(
    classification: jnp.ndarray,  # (B, A, C)
    regression: jnp.ndarray,      # (B, A, 4)
    anchors: jnp.ndarray,         # (A, 4)
    annotations: jnp.ndarray,     # (B, N, 5)
    **kw,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    cls_l, reg_l = jax.vmap(
        lambda c, r, a: focal_loss_single(c, r, anchors, a, **kw)
    )(classification, regression, annotations)
    cls_loss = jnp.mean(cls_l)
    reg_loss = jnp.mean(reg_l)
    total = cls_loss + reg_loss
    return total, {
        "total_loss": total,
        "classification_loss": cls_loss,
        "regression_loss": reg_loss,
    }


# --------------------------------------------------------------------------
# PRN subnet: BCE (reference network/posenet.py:427-445)
# --------------------------------------------------------------------------

def prn_loss(
    output: jnp.ndarray,  # (B, H, W, 17) softmax output in (0, 1)
    label: jnp.ndarray,   # (B, H, W, 17) gaussian targets
    eps: float = 1e-12,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    out = jnp.clip(_at_least_f32(output), eps, 1.0 - eps)
    lbl = _at_least_f32(label)
    loss = -jnp.mean(lbl * jnp.log(out) + (1.0 - lbl) * jnp.log(1.0 - out))
    return loss, {"prn_loss": loss}
