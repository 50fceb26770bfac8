"""Fixed-size on-device NMS — replaces the reference's C/CUDA extension.

The reference dispatches to a CPU C loop or a CUDA bitmask kernel and in the
GPU case round-trips the 64-bit suppression masks through the host
(reference lib/nms/src/nms_cuda.c:33-58, lib/nms/pth_nms.py:5-46).  On TPU the
whole thing is one fused XLA computation with static shapes:

    scores -> threshold mask -> top-k (K candidates) -> KxK IoU matrix
           -> greedy masked suppression (lax.fori_loop over K rows)

K after score thresholding is small (<= a few hundred), so the O(K^2) matrix
lives comfortably in VMEM and the sequential loop is K iterations of cheap
(K,)-vector ops.  A Pallas kernel variant lives in ops/pallas_nms.py.

IoU uses the legacy +1-pixel convention of the reference's native kernels
(lib/nms/src/nms.c:55-58); suppression comparison is strict ``>`` like the
reference GPU kernel (nms_kernel.cu:68).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from multiposenet_tpu.ops.boxes import box_iou_plus1


class NMSResult(NamedTuple):
    boxes: jnp.ndarray    # (K, 4) suppressed entries are zeros
    scores: jnp.ndarray   # (K,)  suppressed entries are -1
    indices: jnp.ndarray  # (K,)  indices into the input; -1 where invalid
    keep: jnp.ndarray     # (K,)  bool keep mask


def nms_fixed(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_thresh: float = 0.5,
    max_out: int = 100,
    score_thresh: float = 0.0,
) -> NMSResult:
    """Greedy hard-NMS with static output size.

    Args:
      boxes: (N, 4) x1y1x2y2.
      scores: (N,).
      iou_thresh: suppression threshold (strict >).
      max_out: K, the static candidate/output capacity.
      score_thresh: candidates below this are dropped before top-k
        (reference posenet.py:271 uses 0.05 in-graph).
    """
    n = scores.shape[0]
    k = min(max_out, n)

    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    masked = jnp.where(scores > score_thresh, scores, neg_inf)
    top_scores, top_idx = jax.lax.top_k(masked, k)
    valid = top_scores > neg_inf

    top_boxes = boxes[top_idx]
    iou = box_iou_plus1(top_boxes, top_boxes)

    def body(i, suppressed):
        alive = jnp.logical_not(suppressed[i]) & valid[i]
        row = (iou[i] > iou_thresh) & alive & (jnp.arange(k) > i)
        return suppressed | row

    suppressed = jax.lax.fori_loop(0, k, body, jnp.zeros((k,), bool))
    keep = valid & jnp.logical_not(suppressed)

    out_boxes = jnp.where(keep[:, None], top_boxes, 0.0)
    out_scores = jnp.where(keep, top_scores, -1.0)
    out_idx = jnp.where(keep, top_idx, -1)
    if k < max_out:
        pad = max_out - k
        out_boxes = jnp.pad(out_boxes, ((0, pad), (0, 0)))
        out_scores = jnp.pad(out_scores, (0, pad), constant_values=-1.0)
        out_idx = jnp.pad(out_idx, (0, pad), constant_values=-1)
        keep = jnp.pad(keep, (0, pad))
    return NMSResult(out_boxes, out_scores, out_idx, keep)


def batched_topk_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_thresh: float = 0.5,
    max_out: int = 100,
    score_thresh: float = 0.0,
) -> NMSResult:
    """vmap of `nms_fixed` over a leading batch axis.

    The reference full-pipeline forward silently processes only batch element
    0 (reference network/posenet.py:271-285); here every element gets NMS.
    """
    fn = jax.vmap(
        lambda b, s: nms_fixed(b, s, iou_thresh=iou_thresh, max_out=max_out,
                               score_thresh=score_thresh)
    )
    return fn(boxes, scores)
