"""Pallas TPU kernel for greedy NMS suppression.

The XLA formulation in ops/nms.py lowers the K-step greedy loop to a chain
of small fused ops; this kernel instead runs the whole suppression in ONE
Pallas program with the (K, K) IoU matrix materialized in VMEM — zero
intermediate HBM traffic and a single kernel launch.  K is padded to the
lane width (128) so every row op is one full VPU vector.

Semantics are identical to `nms_fixed`'s core (given score-sorted candidate
boxes): legacy +1px IoU (reference lib/nms/src/nms.c:55-58), strict `>`
suppression (reference nms_kernel.cu:68).

On non-TPU backends the kernel runs in interpreter mode so tests on the CPU
mesh exercise the same code path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _nms_suppress_kernel(boxes_ref, valid_ref, keep_ref, iou_ref, supp_ref,
                         *, k: int, thresh: float):
    """boxes (K, 4) sorted by score desc; valid (1, K); keep (1, K) float.

    Scratch: iou_ref (K, K) suppression matrix, supp_ref (1, K) running
    suppressed mask — both VMEM.  Dynamic row access goes through refs with
    pl.ds (value-level dynamic_slice is not lowered on TPU Pallas).
    """
    b = boxes_ref[:]
    x1 = b[:, 0]
    y1 = b[:, 1]
    x2 = b[:, 2]
    y2 = b[:, 3]
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)

    # (K, K) IoU with the +1px convention, rows = suppressor, cols = candidate
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    iw = jnp.maximum(ix2 - ix1 + 1.0, 0.0)
    ih = jnp.maximum(iy2 - iy1 + 1.0, 0.0)
    inter = iw * ih
    iou = inter / (area[:, None] + area[None, :] - inter)
    iou_ref[:] = jnp.where(iou > thresh, 1.0, 0.0)

    supp_ref[:] = jnp.zeros((1, k), jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(i, carry):
        # dynamic LANE-dim scalar loads are not lowerable (must be 128-
        # aligned); read element i via a masked vector reduction instead
        alive = 1.0 - jnp.max(jnp.where(col == i, supp_ref[:], 0.0))
        vi = jnp.max(jnp.where(col == i, valid_ref[:], 0.0))

        @pl.when(alive * vi > 0.0)
        def _():
            row = iou_ref[pl.ds(i, 1), :]                  # (1, K) sublane ok
            new = jnp.where(col > i, row, 0.0)
            supp_ref[:] = jnp.maximum(supp_ref[:], new)

        return carry

    jax.lax.fori_loop(0, k, body, 0)
    keep_ref[:] = jnp.where((supp_ref[:] == 0.0) & (valid_ref[:] > 0.0),
                            1.0, 0.0)


@functools.partial(jax.jit, static_argnames=("iou_thresh", "interpret"))
def pallas_nms_suppress(sorted_boxes: jnp.ndarray, valid: jnp.ndarray,
                        iou_thresh: float = 0.5,
                        interpret: bool = False) -> jnp.ndarray:
    """(K, 4) score-sorted boxes + (K,) validity -> (K,) bool keep mask."""
    k = sorted_boxes.shape[0]
    kp = _round_up(max(k, LANE), LANE)
    boxes_p = jnp.zeros((kp, 4), jnp.float32).at[:k].set(
        sorted_boxes.astype(jnp.float32))
    valid_p = jnp.zeros((1, kp), jnp.float32).at[0, :k].set(
        valid.astype(jnp.float32))

    keep = pl.pallas_call(
        functools.partial(_nms_suppress_kernel, k=kp, thresh=float(iou_thresh)),
        out_shape=jax.ShapeDtypeStruct((1, kp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY
                               if interpret else pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY
                               if interpret else pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY
                               if interpret else pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((kp, kp), jnp.float32),
                        pltpu.VMEM((1, kp), jnp.float32)],
        interpret=interpret,
    )(boxes_p, valid_p)
    return keep[0, :k] > 0.0


def nms_fixed_pallas(boxes: jnp.ndarray, scores: jnp.ndarray,
                     iou_thresh: float = 0.5, max_out: int = 100,
                     score_thresh: float = 0.0,
                     interpret: bool | None = None):
    """Drop-in twin of ops.nms.nms_fixed backed by the Pallas kernel."""
    from multiposenet_tpu.ops.nms import NMSResult

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)

    n = scores.shape[0]
    k = min(max_out, n)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    masked = jnp.where(scores > score_thresh, scores, neg_inf)
    top_scores, top_idx = jax.lax.top_k(masked, k)
    valid = top_scores > neg_inf
    top_boxes = boxes[top_idx]

    keep = pallas_nms_suppress(top_boxes, valid, iou_thresh,
                               interpret=interpret)

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
