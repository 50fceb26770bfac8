"""Multi-scale evaluation helpers (reference evaluate/tester.py:38-81,256-331).

Host-side pieces of the coco_eval path: scale selection, crop/pad to
factor-divisible shapes with bucketing (so XLA compiles a bounded set of
shapes instead of one per image), heatmap un-padding/resizing, flip
averaging, and an exact numpy twin of the reference's peak finder for the
variable-resolution averaged heatmaps.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import cv2
import numpy as np

# L/R channel swap for flip averaging, 18-joint order (tester.py:326-327)
SWAP_HEAT_18 = [0, 1, 5, 6, 7, 2, 3, 4, 11, 12, 13, 8, 9, 10, 15, 14, 17, 16]


def get_multipliers(img_h: int, inp_size: int,
                    scale_search: Sequence[float] = (0.5, 1.0, 1.5, 2.0, 2.5)
                    ) -> List[float]:
    """Scales relative to the image height (reference tester.py:256-262)."""
    return [x * inp_size / float(img_h) for x in scale_search]


def _factor_closest(num: float, factor: int, is_ceil: bool = True) -> int:
    num = float(num) / factor
    num = np.ceil(num) if is_ceil else np.floor(num)
    return int(num) * factor


def crop_shape_only(shape_hw: Tuple[int, int], dest_size: float,
                    factor: int = 32, basedon: str = "min",
                    bucket: int = 0) -> Tuple[Tuple[int, int], float,
                                              Tuple[int, int]]:
    """`crop_with_factor`'s shape arithmetic without touching pixels:
    returns (padded (H, W), im_scale, real (H, W)).  Destination size uses
    cv2's rounding (round-half-to-even of dim * scale)."""
    h, w = int(shape_hw[0]), int(shape_hw[1])
    base = {"min": min(h, w), "max": max(h, w), "w": w, "h": h}[basedon]
    im_scale = float(dest_size) / base
    rh = int(np.round(h * im_scale))
    rw = int(np.round(w * im_scale))
    eff = max(factor, bucket)
    return (_factor_closest(rh, eff), _factor_closest(rw, eff)), \
        im_scale, (rh, rw)


def crop_with_factor(im: np.ndarray, dest_size: float, factor: int = 32,
                     pad_val: int = 0, basedon: str = "min",
                     bucket: int = 0) -> Tuple[np.ndarray, float, Tuple]:
    """Scale `basedon` dim to dest_size, pad to /factor (tester.py:38-81).

    `bucket` > 0 additionally pads H and W up to multiples of `bucket` so a
    bounded set of padded shapes reaches the jitted graph (XLA recompiles per
    shape; the reference pays a cudnn re-tune instead).  The valid region is
    returned so padding never leaks into results.

    The resize passes an explicit dsize (round-half-to-even of dim * scale,
    identical sizes to the reference's fx/fy call) rather than fx/fy: on
    cv2 5.x+IPP the fx-form dispatches an IPP kernel whose pixels differ
    from cv2's own classic bilinear by up to ~100 u8 levels, while the
    dsize-form keeps the classic 2-tap path the 2018-era reference
    produced (and which ops/resize.linear_resize_coeffs reproduces).
    """
    (new_h, new_w), im_scale, (rh, rw) = crop_shape_only(
        im.shape[:2], dest_size, factor=factor, basedon=basedon,
        bucket=bucket)
    im = cv2.resize(im, (rw, rh))
    shape = [new_h, new_w] if im.ndim < 3 else [new_h, new_w, im.shape[-1]]
    padded = np.full(shape, pad_val, dtype=im.dtype)
    padded[:rh, :rw] = im
    return padded, im_scale, im.shape


def resize_heatmap_to_original(heatmap_s4: np.ndarray, cropped_shape,
                               real_shape, orig_shape) -> np.ndarray:
    """Stride-4 heatmaps -> original image resolution (tester.py:299-305):
    x4 bicubic, un-pad to the real (non-padded) region, bicubic to original.
    """
    hm = heatmap_s4[: cropped_shape[0] // 4, : cropped_shape[1] // 4, :]
    hm = cv2.resize(hm, None, fx=4, fy=4, interpolation=cv2.INTER_CUBIC)
    hm = hm[: real_shape[0], : real_shape[1], :]
    return cv2.resize(hm, (orig_shape[1], orig_shape[0]),
                      interpolation=cv2.INTER_CUBIC)


def average_flip_heat(normal_heat: np.ndarray, flipped_heat: np.ndarray
                      ) -> np.ndarray:
    """(H, W, 18) average with horizontal un-flip + L/R channel swap
    (reference tester.py:318-331)."""
    return (normal_heat + flipped_heat[:, ::-1, :][:, :, SWAP_HEAT_18]) / 2.0


# ---------------------------------------------------------------------------
# exact host twin of joint_utils.NMS / get_joint_list for variable-size maps
# ---------------------------------------------------------------------------

_CROSS = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], bool)


def local_max_cross(hm: np.ndarray) -> np.ndarray:
    """(H, W, C) -> bool peak mask over ALL channels in one vectorized pass.

    Exactly `maximum_filter(m, footprint=cross) == m` per channel (reference
    joint_utils.py:28): a pixel is a peak iff >= its 4-neighbors; scipy's
    'reflect' boundary makes out-of-range neighbors equal the edge pixel,
    which edge-padding reproduces.  ~10x faster than 18 scipy filter calls.
    """
    p = np.pad(hm, ((1, 1), (1, 1)) + ((0, 0),) * (hm.ndim - 2), mode="edge")
    c = p[1:-1, 1:-1]
    return ((c >= p[:-2, 1:-1]) & (c >= p[2:, 1:-1])
            & (c >= p[1:-1, :-2]) & (c >= p[1:-1, 2:]))


def _compute_resized_coords(coords, factor):
    return (np.asarray(coords, float) + 0.5) * factor - 0.5


def _peak_sites(heatmaps: np.ndarray, thre1: float):
    """Sparse peak detection: gather the 4 neighbors only at above-threshold
    pixels instead of filtering the whole map (~10x less work than dense
    maximum_filter; typically <1% of pixels clear thre1).  Returns (ys, xs,
    cs) in y-major order per channel — identical ordering and edge semantics
    (clamp == scipy 'reflect' at distance 1) to the dense formulation."""
    h, w, _ = heatmaps.shape
    ys, xs, cs = np.nonzero(heatmaps > thre1)
    v = heatmaps[ys, xs, cs]
    keep = ((v >= heatmaps[np.maximum(ys - 1, 0), xs, cs])
            & (v >= heatmaps[np.minimum(ys + 1, h - 1), xs, cs])
            & (v >= heatmaps[ys, np.maximum(xs - 1, 0), cs])
            & (v >= heatmaps[ys, np.minimum(xs + 1, w - 1), cs]))
    return ys[keep], xs[keep], cs[keep]


# cv2 5.0's resize rejects images beyond 128 channels (measured; the
# generic CV_CN_MAX is 512 but the resize kernels cap earlier)
_CV_CN_MAX = 128


def _refine_peak_batch(patches: np.ndarray, factor: float
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sub-pixel refinement for a batch of same-sized peak windows.

    patches: (K, ph, pw) — one window per peak.  All K windows ride ONE
    cv2 INTER_CUBIC resize as channels of a (ph, pw, K) image: the
    interpolation weights are purely spatial, so each channel computes
    the same resize as a lone per-window call (the reference semantics,
    joint_utils.py NMS) at 1/K the dispatch cost — measured 33.7 ->
    8.0 ms per averaged 120x160x18 map at 126 peaks.  cv2's
    channel-vectorized kernel accumulates in a different order than its
    single-channel path, so upsampled VALUES can differ by ~1 f32 ulp
    (3e-8; coordinates only move if an argmax tie sits inside that ulp —
    the razor-tie class every cross-implementation comparison here
    already tolerates).  Returns the argmax (row, col) per window in the
    upsampled frame plus its value; the flattened C-order argmax
    reproduces the reference's first-max tie rule."""
    k, ph, pw = patches.shape
    if k > _CV_CN_MAX:  # cv2 channel ceiling: recurse in halves
        mid = k // 2
        a = _refine_peak_batch(patches[:mid], factor)
        b = _refine_peak_batch(patches[mid:], factor)
        return tuple(np.concatenate(p) for p in zip(a, b))
    stack = np.ascontiguousarray(np.moveaxis(patches, 0, -1))
    if factor != 1.0:
        stack = cv2.resize(stack, None, fx=factor, fy=factor,
                           interpolation=cv2.INTER_CUBIC)
        if stack.ndim == 2:  # cv2 squeezes K=1
            stack = stack[:, :, None]
    uh, uw = stack.shape[:2]
    flat = stack.reshape(uh * uw, k)
    am = flat.argmax(axis=0)
    return am // uw, am % uw, flat[am, np.arange(k)]


def find_peaks_np(heatmaps: np.ndarray, thre1: float = 0.1,
                  upsamp_factor: float = 1.0, refine: bool = True,
                  win_size: int = 2) -> List[np.ndarray]:
    """Host twin of the reference peak finder (joint_utils.py NMS
    semantics): per joint, rows [x, y, score, id] at the upsampled
    resolution.

    Fully batched: sparse local-max sites for every joint come from one
    vectorized pass (_peak_sites), their refinement windows are gathered
    with fancy indexing, grouped by window size (borders truncate the
    win_size=2 window, so up to 9 (ph, pw) shapes exist), and each group
    is upsampled + argmax'd in one call (_refine_peak_batch).  Per-peak
    python work is gone — this is the `--host-peaks` fallback's hot loop.
    """
    h, w, num_j = heatmaps.shape
    ys, xs, cs = _peak_sites(heatmaps, thre1)
    # emission order = per-joint, y-major within a joint (the id column
    # feeds grouping); _peak_sites is y-major-then-channel, so a stable
    # channel sort yields it
    order = np.argsort(cs, kind="stable")
    ys, xs, cs = ys[order], xs[order], cs[order]
    n = len(ys)

    d_yx = np.zeros((n, 2))
    scores = heatmaps[ys, xs, cs].astype(np.float64)
    if refine and n:
        y0 = np.maximum(ys - win_size, 0)
        y1 = np.minimum(ys + win_size, h - 1)
        x0 = np.maximum(xs - win_size, 0)
        x1 = np.minimum(xs + win_size, w - 1)
        ph, pw = y1 - y0 + 1, x1 - x0 + 1
        for hh, ww in set(zip(ph.tolist(), pw.tolist())):
            g = np.nonzero((ph == hh) & (pw == ww))[0]
            gy = y0[g, None, None] + np.arange(hh)[None, :, None]
            gx = x0[g, None, None] + np.arange(ww)[None, None, :]
            ly, lx, val = _refine_peak_batch(
                heatmaps[gy, gx, cs[g, None, None]], upsamp_factor)
            centers = _compute_resized_coords(
                np.stack([ys[g] - y0[g], xs[g] - x0[g]], 1), upsamp_factor)
            d_yx[g, 0] = ly - centers[:, 0]
            d_yx[g, 1] = lx - centers[:, 1]
            scores[g] = val

    base = _compute_resized_coords(np.stack([xs, ys], 1), upsamp_factor)
    # np.round == the reference's python round (both half-to-even; the
    # half-pixel grid mapping makes exact .5 sums common)
    xy = np.round(base + d_yx[:, ::-1])
    rows_all = np.concatenate(
        [xy, scores[:, None], np.arange(n, dtype=float)[:, None]], axis=1)
    return [rows_all[cs == j] for j in range(num_j)]


def joint_list_from_heatmaps(heatmaps: np.ndarray, img_h: int, scale: float,
                             thre1: float = 0.1,
                             refine: bool = True) -> np.ndarray:
    """get_joint_list (reference joint_utils.py:141-152): rows
    [x, y, score, id, joint_type]."""
    per_type = find_peaks_np(heatmaps, thre1,
                             img_h / float(heatmaps.shape[0]),
                             refine=refine)
    for peaks in per_type:
        peaks[:, :2] *= scale
    rows = [tuple(p) + (j,) for j, peaks in enumerate(per_type) for p in peaks]
    return np.array(rows).reshape(-1, 5)
