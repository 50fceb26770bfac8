"""RetinaNet anchor generation — computed once per input shape at trace time.

The reference rebuilds anchors in numpy on the host on *every forward call*
and ships them to the device (reference network/anchors.py:21-37).  Here the
anchor grid is a pure function of the static input shape, so it is computed
once in numpy when the graph is traced and folded into the compiled
executable as a constant — zero host work and zero H2D traffic per step.

Numerics match the reference exactly:
- base anchors: ``generate_anchors`` (reference network/anchors.py:39-71)
- grid shift with +0.5 cell-center offset (reference network/anchors.py:106-126)
- per-level feature shapes via ceil-division (reference network/anchors.py:24-25)
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import numpy as np

from multiposenet_tpu.config import AnchorConfig


def generate_base_anchors(
    base_size: float,
    ratios: Sequence[float],
    scales: Sequence[float],
) -> np.ndarray:
    """(len(ratios)*len(scales), 4) anchors in x1y1x2y2 centered at origin."""
    ratios = np.asarray(ratios, dtype=np.float64)
    scales = np.asarray(scales, dtype=np.float64)
    num = len(ratios) * len(scales)

    anchors = np.zeros((num, 4), dtype=np.float64)
    # widths/heights = base_size * scales, tiled over ratios
    anchors[:, 2:] = base_size * np.tile(scales, (2, len(ratios))).T
    areas = anchors[:, 2] * anchors[:, 3]
    # correct for aspect ratio: w = sqrt(area/ratio), h = w * ratio
    anchors[:, 2] = np.sqrt(areas / np.repeat(ratios, len(scales)))
    anchors[:, 3] = anchors[:, 2] * np.repeat(ratios, len(scales))
    # center at origin: (0,0,w,h) -> (-w/2,-h/2,w/2,h/2)
    anchors[:, 0::2] -= np.tile(anchors[:, 2] * 0.5, (2, 1)).T
    anchors[:, 1::2] -= np.tile(anchors[:, 3] * 0.5, (2, 1)).T
    return anchors


def _shift(feat_shape: Tuple[int, int], stride: int, anchors: np.ndarray) -> np.ndarray:
    """Tile base anchors over a feature grid with cell-center offsets."""
    shift_x = (np.arange(0, feat_shape[1]) + 0.5) * stride
    shift_y = (np.arange(0, feat_shape[0]) + 0.5) * stride
    sx, sy = np.meshgrid(shift_x, shift_y)
    shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=1)
    # (K,1,4) + (1,A,4) -> (K,A,4) -> (K*A,4); A fastest-varying like the reference
    out = shifts[:, None, :] + anchors[None, :, :]
    return out.reshape(-1, 4)


@functools.lru_cache(maxsize=64)
def anchors_for_shape(
    image_shape: Tuple[int, int],
    cfg: AnchorConfig = AnchorConfig(),
) -> np.ndarray:
    """All anchors for an (H, W) input, concatenated over pyramid levels.

    Returns a float32 (A_total, 4) numpy array.  Being a host constant, it is
    closed over by jitted functions and baked into the executable.
    """
    image_shape = np.asarray(image_shape[:2])
    all_anchors = []
    for level, stride, size in zip(cfg.pyramid_levels, cfg.strides, cfg.sizes):
        feat_shape = (image_shape + 2 ** level - 1) // (2 ** level)
        base = generate_base_anchors(size, cfg.ratios, cfg.scales)
        all_anchors.append(_shift(tuple(int(x) for x in feat_shape), stride, base))
    return np.concatenate(all_anchors, axis=0).astype(np.float32)


def num_anchors_for_shape(image_shape: Tuple[int, int], cfg: AnchorConfig = AnchorConfig()) -> int:
    return anchors_for_shape(tuple(image_shape), cfg).shape[0]
