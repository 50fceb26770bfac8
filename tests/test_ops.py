"""Unit tests for the core ops library against independent numpy references."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.ndimage as ndi

from multiposenet_tpu.config import AnchorConfig
from multiposenet_tpu.ops import (
    anchors_for_shape,
    batched_topk_nms,
    box_iou,
    box_iou_plus1,
    clip_boxes,
    decode_boxes,
    encode_boxes,
    find_peaks_refined,
    focal_loss_single,
    gaussian_blur,
    generate_base_anchors,
    keypoint_loss,
    make_heatmaps,
    make_heatmaps_np,
    nms_fixed,
    prn_loss,
)


# ----------------------------------------------------------------- anchors

def test_base_anchors_level3():
    """Level 3: base_size 32, 9 anchors, areas preserved per scale."""
    a = generate_base_anchors(32, (0.5, 1.0, 2.0), (1.0, 2 ** (1 / 3), 2 ** (2 / 3)))
    assert a.shape == (9, 4)
    w = a[:, 2] - a[:, 0]
    h = a[:, 3] - a[:, 1]
    # ratio = h / w in [0.5, 1, 2] blocks of 3
    np.testing.assert_allclose(h[:3] / w[:3], 0.5, rtol=1e-6)
    np.testing.assert_allclose(h[3:6] / w[3:6], 1.0, rtol=1e-6)
    np.testing.assert_allclose(h[6:] / w[6:], 2.0, rtol=1e-6)
    # area of the unit-scale square anchor is base_size^2
    np.testing.assert_allclose(w[3] * h[3], 32.0 ** 2, rtol=1e-6)
    # centered at origin
    np.testing.assert_allclose(a[:, 0] + a[:, 2], 0, atol=1e-9)


def test_anchor_counts_480():
    cfg = AnchorConfig()
    a = anchors_for_shape((480, 480), cfg)
    expect = sum(9 * ((480 + 2 ** l - 1) // 2 ** l) ** 2 for l in cfg.pyramid_levels)
    assert a.shape == (expect, 4)
    # first cell of level 3 is centered at (0.5 * stride) = 4
    np.testing.assert_allclose([(a[0, 0] + a[0, 2]) / 2, (a[0, 1] + a[0, 3]) / 2],
                               [4.0, 4.0], atol=1e-4)


# ------------------------------------------------------------------- boxes

def test_encode_decode_roundtrip(rng):
    anchors = np.array([[10, 10, 50, 60], [0, 0, 100, 100]], np.float32)
    gt = np.array([[12, 8, 48, 66], [5, 5, 90, 80]], np.float32)
    deltas = encode_boxes(jnp.asarray(anchors), jnp.asarray(gt))
    rec = decode_boxes(jnp.asarray(anchors), deltas)
    np.testing.assert_allclose(np.asarray(rec), gt, atol=5e-3)  # f32 exp/log roundtrip


def test_iou_known_values():
    a = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    b = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], jnp.float32)
    iou = np.asarray(box_iou(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 25.0 / 175.0, 0.0], rtol=1e-6)


def test_iou_plus1_matches_c_convention():
    # +1 convention: identical boxes IoU 1; w/h computed with +1
    a = jnp.asarray([[0, 0, 9, 9]], jnp.float32)   # 10x10 area in +1 convention
    b = jnp.asarray([[5, 5, 14, 14]], jnp.float32)
    iou = float(box_iou_plus1(a, b)[0, 0])
    inter = 5 * 5
    union = 100 + 100 - inter
    assert abs(iou - inter / union) < 1e-6


def test_clip_boxes():
    b = jnp.asarray([[[-5, -3, 700, 500]]], jnp.float32)
    c = np.asarray(clip_boxes(b, 480, 640))
    np.testing.assert_allclose(c[0, 0], [0, 0, 640, 480])


# --------------------------------------------------------------------- nms

def _nms_ref(boxes, scores, thresh):
    """Literal transcription of the greedy algorithm (+1 px IoU, > thresh)."""
    order = np.argsort(-scores)
    keep, suppressed = [], np.zeros(len(scores), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            w = max(0.0, xx2 - xx1 + 1)
            h = max(0.0, yy2 - yy1 + 1)
            inter = w * h
            a_i = (boxes[i, 2] - boxes[i, 0] + 1) * (boxes[i, 3] - boxes[i, 1] + 1)
            a_j = (boxes[j, 2] - boxes[j, 0] + 1) * (boxes[j, 3] - boxes[j, 1] + 1)
            if inter / (a_i + a_j - inter) > thresh:
                suppressed[j] = True
    return sorted(keep, key=lambda i: -scores[i])


def test_nms_matches_reference_greedy(rng):
    n = 60
    ctr = rng.uniform(20, 200, (n, 2))
    wh = rng.uniform(10, 80, (n, 2))
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)

    res = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_out=64)
    got = [int(i) for i in np.asarray(res.indices) if i >= 0]
    expect = _nms_ref(boxes, scores, 0.5)
    assert got == expect


def test_nms_score_threshold_and_padding():
    boxes = jnp.asarray([[0, 0, 10, 10], [100, 100, 110, 110]], jnp.float32)
    scores = jnp.asarray([0.9, 0.01], jnp.float32)
    res = nms_fixed(boxes, scores, 0.5, max_out=8, score_thresh=0.05)
    assert int(res.keep.sum()) == 1
    assert res.scores.shape == (8,)
    assert float(res.scores[1]) == -1.0


def test_nms_batched():
    boxes = jnp.tile(jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11]], jnp.float32), (3, 1, 1))
    scores = jnp.tile(jnp.asarray([0.9, 0.8], jnp.float32), (3, 1))
    res = batched_topk_nms(boxes, scores, 0.5, max_out=4)
    assert res.keep.shape == (3, 4)
    np.testing.assert_array_equal(np.asarray(res.keep.sum(-1)), [1, 1, 1])


# ------------------------------------------------------------------ losses

def test_focal_loss_no_annotations_is_zero():
    a = np.asarray(anchors_for_shape((64, 64)))
    cls = jnp.full((a.shape[0], 1), 0.5)
    reg = jnp.zeros((a.shape[0], 4))
    ann = -jnp.ones((5, 5))
    cl, rl = focal_loss_single(cls, reg, jnp.asarray(a), ann)
    assert float(cl) == 0.0 and float(rl) == 0.0


def test_focal_loss_perfect_prediction_small():
    """A perfectly predicted positive ->  tiny cls loss, zero reg loss."""
    anchors = jnp.asarray([[0, 0, 100, 100], [200, 200, 220, 220]], jnp.float32)
    ann = jnp.asarray([[0, 0, 100, 100, 0], [-1, -1, -1, -1, -1]], jnp.float32)
    cls = jnp.asarray([[1.0 - 1e-4], [1e-4]], jnp.float32)
    reg = encode_boxes(anchors, jnp.tile(ann[:1, :4], (2, 1)))
    cl, rl = focal_loss_single(cls, reg, anchors, ann)
    assert float(cl) < 1e-4
    assert float(rl) < 1e-6


def test_focal_loss_ignore_band():
    """Anchors with IoU in [0.4, 0.5) contribute nothing."""
    anchors = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 22.3]], jnp.float32)
    # second anchor IoU vs gt [0,0,10,10] = 100/223 ~ 0.448 -> ignored
    ann = jnp.asarray([[0, 0, 10, 10, 0]], jnp.float32)
    cls_hi = jnp.asarray([[0.999], [0.999]], jnp.float32)
    cls_lo = jnp.asarray([[0.999], [0.001]], jnp.float32)
    reg = jnp.zeros((2, 4))
    l_hi, _ = focal_loss_single(cls_hi, reg, anchors, ann)
    l_lo, _ = focal_loss_single(cls_lo, reg, anchors, ann)
    np.testing.assert_allclose(float(l_hi), float(l_lo), rtol=1e-5)


def test_keypoint_loss_masking():
    b, h, w, j = 2, 8, 8, 18
    tgt = jnp.ones((b, h, w, j)) * 0.5
    mask = jnp.zeros((b, h, w, j))
    outs = [jnp.ones((b, h, w, 19))] * 5
    loss, logs = keypoint_loss(outs, tgt, mask)
    assert float(loss) == 0.0
    mask = jnp.ones((b, h, w, j))
    loss, logs = keypoint_loss(outs, tgt, mask)
    np.testing.assert_allclose(float(loss), 5 * 0.25, rtol=1e-6)
    assert "heatmap_loss_k2" in logs and "max_ht" in logs


def test_prn_loss_matches_numpy():
    rng = np.random.RandomState(1)
    out = rng.uniform(0.01, 0.99, (2, 56, 36, 17)).astype(np.float32)
    lbl = rng.uniform(0, 1, (2, 56, 36, 17)).astype(np.float32)
    loss, _ = prn_loss(jnp.asarray(out), jnp.asarray(lbl))
    expect = -(lbl * np.log(out) + (1 - lbl) * np.log(1 - out)).mean()
    np.testing.assert_allclose(float(loss), expect, rtol=1e-5)


# ---------------------------------------------------------------- heatmaps

def test_heatmap_matches_reference_putgaussian():
    """Device heatmaps == literal numpy transcription of putGaussianMaps."""
    joints = np.array(
        [
            [[60.0, 40.0, 1.0], [200.0, 100.0, 0.0], [10.0, 10.0, 2.0]],
            [[65.0, 45.0, 1.0], [1.0, 1.0, 2.0], [1.0, 1.0, 2.0]],
        ],
        np.float32,
    )  # (P=2, J=3)
    got = np.asarray(make_heatmaps(jnp.asarray(joints), 120, 120, 4, 7.0))

    # independent reference
    stride, sigma = 4, 7.0
    start = stride / 2.0 - 0.5
    xx, yy = np.meshgrid(np.arange(120), np.arange(120))
    xx = xx * stride + start
    yy = yy * stride + start
    expect = np.zeros((120, 120, 3))
    for p in range(2):
        for j in range(3):
            if joints[p, j, 2] > 1:
                continue
            d2 = (xx - joints[p, j, 0]) ** 2 + (yy - joints[p, j, 1]) ** 2
            e = d2 / 2.0 / sigma / sigma
            expect[:, :, j] = np.minimum(expect[:, :, j] + (e <= 4.6052) * np.exp(-e), 1.0)
    np.testing.assert_allclose(got, expect, atol=1e-5)
    np.testing.assert_allclose(got, make_heatmaps_np(joints, 120, 120, 4, 7.0), atol=1e-5)


# ---------------------------------------------------------------- gaussian

@pytest.mark.parametrize("sigma,mode", [(1.0, "nearest"), (2.0, "constant")])
def test_gaussian_blur_matches_scipy(sigma, mode, rng):
    x = rng.rand(56, 36, 3).astype(np.float32)
    got = np.asarray(gaussian_blur(jnp.asarray(x), sigma=sigma, mode=mode))
    expect = np.stack(
        [ndi.gaussian_filter(x[:, :, c], sigma, mode=mode) for c in range(3)], -1
    )
    np.testing.assert_allclose(got, expect, atol=2e-5)


# ------------------------------------------------------------------- peaks

def test_find_peaks_simple():
    hm = np.zeros((30, 40, 2), np.float32)
    hm[10, 20, 0] = 0.9
    hm[5, 7, 0] = 0.5
    hm[3, 3, 1] = 0.05  # below threshold
    ps = find_peaks_refined(jnp.asarray(hm), thre1=0.1, max_peaks=4, upsamp_factor=1)
    v = np.asarray(ps.valid)
    assert v[0].sum() == 2 and v[1].sum() == 0
    coords = np.asarray(ps.coords)[0]
    scores = np.asarray(ps.scores)[0]
    assert tuple(coords[0]) == (20, 10) and abs(scores[0] - 0.9) < 1e-6
    assert tuple(coords[1]) == (7, 5)


def test_find_peaks_subpixel_refinement_matches_cv2():
    """Refined location for an off-center gaussian peak, factor 4 vs cv2."""
    import cv2

    hm = np.zeros((30, 40, 1), np.float32)
    yy, xx = np.mgrid[0:30, 0:40]
    # continuous max at (x=20.6, y=10.3)
    hm[:, :, 0] = np.exp(-((xx - 20.6) ** 2 + (yy - 10.3) ** 2) / 4.0)

    f = 4
    ps = find_peaks_refined(jnp.asarray(hm), 0.1, 4, upsamp_factor=f)
    got = tuple(np.asarray(ps.coords)[0, 0])

    # reference computation (joint_utils.NMS, interior case)
    peak = (21, 10)  # x, y integer argmax
    x0, y0 = peak[0] - 2, peak[1] - 2
    patch = hm[y0:y0 + 5, x0:x0 + 5, 0]
    up = cv2.resize(patch, None, fx=f, fy=f, interpolation=cv2.INTER_CUBIC)
    loc = np.unravel_index(up.argmax(), up.shape)
    expect = (x0 * f + loc[1], y0 * f + loc[0])
    assert got == expect
    # score parity with the cv2-upsampled patch max
    np.testing.assert_allclose(float(np.asarray(ps.scores)[0, 0]), up.max(), atol=1e-4)


def test_find_peaks_plateau_and_capacity():
    hm = np.zeros((16, 16, 1), np.float32)
    for i, (y, x) in enumerate([(2, 2), (2, 12), (12, 2), (12, 12), (7, 7)]):
        hm[y, x, 0] = 0.5 + 0.05 * i
    ps = find_peaks_refined(jnp.asarray(hm), 0.1, max_peaks=3, upsamp_factor=1)
    assert int(np.asarray(ps.valid).sum()) == 3  # capacity-limited, top-3 kept
    assert np.all(np.asarray(ps.scores)[0, :3] >= 0.6 - 1e-6)


def test_find_peaks_batched_equals_vmapped(rng):
    """find_peaks_refined_batched == vmap(find_peaks_refined) exactly —
    coords, scores, valid — on random multi-blob heatmaps (refined and
    unrefined, factor 1 and 4)."""
    import jax

    from multiposenet_tpu.ops.peaks import find_peaks_refined_batched

    hm = np.zeros((3, 40, 32, 4), np.float32)
    yy, xx = np.mgrid[0:40, 0:32]
    for b in range(3):
        for j in range(4):
            for _ in range(rng.randint(1, 6)):
                cy, cx = rng.uniform(2, 38), rng.uniform(2, 30)
                hm[b, :, :, j] += rng.uniform(0.3, 1.0) * np.exp(
                    -((xx - cx) ** 2 + (yy - cy) ** 2) / rng.uniform(2, 6))
    for refine, f in [(True, 4), (True, 1), (False, 4)]:
        ref = jax.vmap(lambda x: find_peaks_refined(
            x, 0.1, 8, upsamp_factor=f, refine=refine))(jnp.asarray(hm))
        got = find_peaks_refined_batched(jnp.asarray(hm), 0.1, 8,
                                         upsamp_factor=f, refine=refine)
        np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(got.valid))
        np.testing.assert_array_equal(np.asarray(ref.coords), np.asarray(got.coords))
        np.testing.assert_allclose(np.asarray(ref.scores), np.asarray(got.scores),
                                   atol=1e-6)


@pytest.mark.parametrize("regime", ["continuous", "quantized", "peaklike"])
def test_topk_hierarchical_equals_lax_topk(regime, rng):
    """_topk_hierarchical must reproduce lax.top_k ELEMENT-FOR-ELEMENT —
    values AND indices — including tie order (equal values -> ascending
    index) and the -1-fill regime the peak finder feeds it (fewer real
    entries than k, every other cell exactly -1)."""
    import jax

    from multiposenet_tpu.ops.peaks import _topk_hierarchical

    for trial in range(8):
        j, n, k = 5, 1440, 32
        if regime == "continuous":
            x = rng.randn(j, n).astype(np.float32)
        elif regime == "quantized":
            # heavy exact ties across and within segments
            x = rng.randint(0, 4, (j, n)).astype(np.float32)
        else:
            # peak-finder shape: sparse positives on a -1 background,
            # including rows with FEWER than k entries above the fill
            x = np.full((j, n), -1.0, np.float32)
            for row in range(j):
                npk = int(rng.randint(0, 2 * k))
                pos = rng.choice(n, size=npk, replace=False)
                x[row, pos] = rng.rand(npk).astype(np.float32)
        ref_v, ref_i = jax.lax.top_k(jnp.asarray(x), k)
        got_v, got_i = _topk_hierarchical(jnp.asarray(x), k, seg_len=96)
        np.testing.assert_array_equal(np.asarray(ref_v), np.asarray(got_v))
        np.testing.assert_array_equal(np.asarray(ref_i), np.asarray(got_i))


def test_topk_hierarchical_pads_non_divisible(rng):
    import jax

    from multiposenet_tpu.ops.peaks import _topk_hierarchical

    x = rng.randn(3, 997).astype(np.float32)  # 997 % 96 != 0 -> pad path
    ref_v, ref_i = jax.lax.top_k(jnp.asarray(x), 16)
    got_v, got_i = _topk_hierarchical(jnp.asarray(x), 16, seg_len=96)
    np.testing.assert_array_equal(np.asarray(ref_v), np.asarray(got_v))
    np.testing.assert_array_equal(np.asarray(ref_i), np.asarray(got_i))


def test_blur_matrix_equals_separable_gaussian_blur():
    """blur_matrix folds the scipy-'nearest' separable blur into dense
    operators — must match ops.gaussian.gaussian_blur exactly."""
    import numpy as np
    import jax.numpy as jnp
    from multiposenet_tpu.ops.gaussian import blur_matrix, gaussian_blur

    rng = np.random.RandomState(0)
    x = rng.rand(3, 56, 36, 17).astype(np.float32)
    ref = np.asarray(gaussian_blur(jnp.asarray(x), sigma=1.0, mode="nearest"))
    gh = blur_matrix(56, sigma=1.0, mode="nearest")
    gw = blur_matrix(36, sigma=1.0, mode="nearest")
    out = np.einsum("yY,bYXc,xX->byxc", gh, x, gw)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_onehot_contraction_equals_scatter_max_blur():
    """The scatter-free PRN grid build (engine/inference.py) must equal the
    reference-shaped scatter-max + gaussian blur, including same-cell dedupe
    (two peaks in one cell -> 1.0, not 2.0)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from multiposenet_tpu.ops.gaussian import blur_matrix, gaussian_blur

    B, J, P, gh, gw = 4, 17, 8, 56, 36
    rng = np.random.RandomState(1)
    y0 = rng.randint(0, gh, (B, J, P))
    x0 = rng.randint(0, gw, (B, J, P))
    inside = rng.rand(B, J, P) > 0.5
    # force a same-cell collision
    y0[0, 0, :2] = 5; x0[0, 0, :2] = 7; inside[0, 0, :2] = True

    # scatter-max + separable blur (the old formulation)
    b_idx = np.broadcast_to(np.arange(B)[:, None, None], inside.shape)
    j_idx = np.broadcast_to(np.arange(J)[None, :, None], inside.shape)
    marks = np.zeros((B, gh, gw, J), np.float32)
    np.maximum.at(marks, (b_idx.ravel(), np.where(inside, y0, 0).ravel(),
                          np.where(inside, x0, 0).ravel(), j_idx.ravel()),
                  inside.astype(np.float32).ravel())
    ref = np.asarray(gaussian_blur(jnp.asarray(marks), sigma=1.0,
                                   mode="nearest"))

    # one-hot contraction + dense blur matmuls (the new formulation)
    oh_y = jax.nn.one_hot(jnp.asarray(y0), gh, dtype=jnp.float32) \
        * jnp.asarray(inside)[..., None]
    oh_x = jax.nn.one_hot(jnp.asarray(x0), gw, dtype=jnp.float32)
    m = jnp.minimum(jnp.einsum("bjpy,bjpx->bjyx", oh_y, oh_x,
                               precision=jax.lax.Precision.HIGHEST), 1.0)
    out = jnp.einsum("yY,bjYX,xX->byxj",
                     jnp.asarray(blur_matrix(gh, 1.0, "nearest")), m,
                     jnp.asarray(blur_matrix(gw, 1.0, "nearest")),
                     precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_bf16_grid_build_counts_exact_and_blur_bounded():
    """The bf16 PRN grid build (engine/inference.py under a bf16 compute
    dtype) must keep the one-hot cell COUNTS exact — integers <= 256 are
    representable in bf16's 8-bit significand, covering the escalated
    128-peak tier — and its blurred grids within bf16 quantization
    (~2^-8 relative on [0, 1] values) of the f32 HIGHEST build."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from multiposenet_tpu.ops.gaussian import blur_matrix

    gh, gw, J = 56, 36, 17
    P = 250  # above the escalated 128-peak tier, still bf16-exact
    rng = np.random.RandomState(2)
    y0 = rng.randint(0, gh, (J, P))
    x0 = rng.randint(0, gw, (J, P))
    inside = rng.rand(J, P) > 0.3
    # force a worst-case pile-up: every peak of joint 0 in ONE cell
    y0[0] = 11; x0[0] = 9; inside[0] = True

    def build(dt, prec):
        oh_y = jax.nn.one_hot(jnp.asarray(y0), gh, dtype=dt) \
            * jnp.asarray(inside, dt)[..., None]
        oh_x = jax.nn.one_hot(jnp.asarray(x0), gw, dtype=dt)
        cnt = jnp.einsum("jpy,jpx->jyx", oh_y, oh_x)
        marks = jnp.minimum(cnt, jnp.asarray(1.0, dt))
        by = jnp.asarray(blur_matrix(gh, 1.0, "nearest"), dt)
        bx = jnp.asarray(blur_matrix(gw, 1.0, "nearest"), dt)
        g = jnp.einsum("yY,jYx->jyx", by, marks, precision=prec)
        return cnt, jnp.einsum("xX,jyX->jyx", bx, g, precision=prec)

    cnt16, g16 = build(jnp.bfloat16, None)
    cnt32, g32 = build(jnp.float32, jax.lax.Precision.HIGHEST)

    # counts exact (the P-peak pile-up lands exactly at P in bf16)
    np.testing.assert_array_equal(np.asarray(cnt16, np.float32),
                                  np.asarray(cnt32))
    assert float(np.asarray(cnt16, np.float32).max()) == P
    # blurred grids within bf16 quantization of the f32 build
    diff = np.abs(np.asarray(g16, np.float32) - np.asarray(g32))
    assert diff.max() < 8e-3, diff.max()


def test_cubic_resize_matrix_matches_cv2():
    """Dense bicubic operators must equal cv2.resize INTER_CUBIC (float
    path, A=-0.75, replicate borders) to float rounding."""
    import cv2
    import numpy as np
    from multiposenet_tpu.ops.resize import cubic_resize_matrix

    rng = np.random.RandomState(0)
    for (hi, wi, ho, wo) in [(60, 45, 240, 180), (37, 53, 480, 640),
                             (120, 160, 60, 80), (33, 21, 132, 84)]:
        x = rng.rand(hi, wi).astype(np.float32)
        ref = cv2.resize(x, (wo, ho), interpolation=cv2.INTER_CUBIC)
        got = cubic_resize_matrix(hi, ho) @ x @ cubic_resize_matrix(wi, wo).T
        np.testing.assert_allclose(got, ref, atol=2e-6)


@pytest.mark.slow  # compile-heavy (tiering: docs/TESTING.md)
def test_heatmap_resize_mats_match_reference_chain():
    """Composed matrices == the host x4-bicubic -> crop -> resize chain
    (reference tester.py:299-305), with zeroed padding rows/cols."""
    import numpy as np
    from multiposenet_tpu.eval.multiscale import resize_heatmap_to_original
    from multiposenet_tpu.ops.resize import heatmap_resize_mats

    rng = np.random.RandomState(1)
    s4h, s4w = 48, 64
    hm = rng.rand(s4h, s4w, 18).astype(np.float32)
    cropped = (s4h * 4, s4w * 4, 3)
    real = (s4h * 4 - 13, s4w * 4 - 7, 3)
    orig = (480, 640, 3)
    ref = resize_heatmap_to_original(hm, cropped, real, orig)
    rh, rwt = heatmap_resize_mats(s4h, s4w, real[0], real[1], 480, 640,
                                  512, 704)
    got = np.einsum("oh,hwc,wx->oxc", rh, hm, rwt)
    np.testing.assert_allclose(got[:480, :640], ref, atol=1e-4)
    assert np.abs(got[480:]).max() == 0 and np.abs(got[:, 640:]).max() == 0
