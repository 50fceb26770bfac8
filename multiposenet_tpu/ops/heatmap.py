"""Gaussian heatmap target synthesis — on device, inside the train step.

The reference builds targets per-joint per-person in numpy inside dataloader
workers (reference datasets/coco_data/heatmap.py:20-41, putGaussianMaps).
Here targets are a vectorized function of the (padded) augmented joint array,
so they can run on-TPU fused into the train step; the host ships only a tiny
(P, J, 3) joint tensor instead of a (H/4, W/4, 18) float map per sample.

Numerics match putGaussianMaps exactly:
  grid      = ix * stride + stride/2 - 0.5
  exponent  = d^2 / (2 sigma^2), cut off at 4.6052 (= ln(100))
  channel   = clip(sum over people, 0, 1)
(sequential accumulate-then-clip in the reference equals sum-then-clip since
all contributions are non-negative; proven by induction on min(a+b,1)+c.)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

LN100 = 4.6052


def make_heatmaps(
    joints: jnp.ndarray,
    grid_h: int,
    grid_w: int,
    stride: int = 4,
    sigma: float = 7.0,
) -> jnp.ndarray:
    """(P, J, 3) padded joints -> (grid_h, grid_w, J) heatmaps.

    joints[..., 2] is visibility; a gaussian is drawn iff v <= 1
    (reference COCO_data_pipeline.py:225-235).  Pad with v=2.
    """
    start = stride / 2.0 - 0.5
    ys = jnp.arange(grid_h, dtype=jnp.float32) * stride + start
    xs = jnp.arange(grid_w, dtype=jnp.float32) * stride + start

    cx = joints[..., 0].astype(jnp.float32)  # (P, J)
    cy = joints[..., 1].astype(jnp.float32)
    draw = (joints[..., 2] <= 1.0).astype(jnp.float32)

    dx2 = jnp.square(xs[None, None, :] - cx[..., None])      # (P, J, W)
    dy2 = jnp.square(ys[None, None, :] - cy[..., None])      # (P, J, H)
    # exponent (P, J, H, W) built from separable pieces
    expo = (dy2[..., :, None] + dx2[..., None, :]) / (2.0 * sigma * sigma)
    g = jnp.where(expo <= LN100, jnp.exp(-expo), 0.0)
    g = g * draw[..., None, None]
    heat = jnp.clip(jnp.sum(g, axis=0), 0.0, 1.0)            # (J, H, W)
    return jnp.transpose(heat, (1, 2, 0))


def make_heatmaps_np(
    joints: np.ndarray,
    grid_h: int,
    grid_w: int,
    stride: int = 4,
    sigma: float = 7.0,
) -> np.ndarray:
    """Numpy twin of `make_heatmaps` for host pipelines / fixtures."""
    start = stride / 2.0 - 0.5
    ys = np.arange(grid_h, dtype=np.float32) * stride + start
    xs = np.arange(grid_w, dtype=np.float32) * stride + start
    num_j = joints.shape[1]
    heat = np.zeros((grid_h, grid_w, num_j), dtype=np.float32)
    for p in range(joints.shape[0]):
        for j in range(num_j):
            if joints[p, j, 2] > 1:
                continue
            d2 = (xs[None, :] - joints[p, j, 0]) ** 2 + (ys[:, None] - joints[p, j, 1]) ** 2
            expo = d2 / (2.0 * sigma * sigma)
            g = np.where(expo <= LN100, np.exp(-expo), 0.0)
            heat[:, :, j] = np.clip(heat[:, :, j] + g, 0.0, 1.0)
    return heat
