"""Fused inference graphs: the reference's multi-stage host/device ping-pong
as single jitted XLA computations.

The reference full pipeline (evaluate/tester.py:195-254, network/posenet.py:236-285)
crosses the host boundary five times per image: anchor generation (numpy),
NMS bitmask reduce (CUDA->CPU), heatmap peak finding (scipy), PRN input
assembly (numpy, one H2D per person), PRN scoring windows (numpy).  Here:

  detect_and_peaks : image -> heatmaps, NMS'd boxes, refined peaks  (one jit)
  prn_score        : peaks + boxes -> PRN grids -> PRN -> per-peak scores (one jit)

Only the tiny greedy mutual-best assignment (reference tester.py:431-483)
remains on host (eval/grouping.py) — it is O(people x peaks) scalar logic on
a few hundred values.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from multiposenet_tpu.config import Config
from multiposenet_tpu.models.posenet import PoseNet
from multiposenet_tpu.ops.anchors import anchors_for_shape
from multiposenet_tpu.ops.boxes import clip_boxes, decode_boxes
from multiposenet_tpu.ops.gaussian import blur_matrix
from multiposenet_tpu.ops.nms import batched_topk_nms, NMSResult
from multiposenet_tpu.ops.peaks import find_peaks_refined_batched, PeakSet

# ImageNet statistics (reference datasets/coco_data/preprocessing.py:15-26)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess_on_device(img_rgb_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 RGB (B,H,W,3) -> normalized float (B,H,W,3), on device.

    The reference normalizes in numpy per image (resnet_preprocess); here it
    fuses into the first conv.
    """
    x = img_rgb_u8.astype(jnp.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


class PipelineOutput(NamedTuple):
    heatmaps: jnp.ndarray   # (B, H/4, W/4, 18)
    detections: Optional[NMSResult]  # boxes (B,K,4) scores (B,K) at input
    #                     resolution; None when built with_detections=False
    peaks: PeakSet          # (B,J,P,...) coords in input-image pixels


def make_full_pipeline(model: PoseNet, cfg: Config, image_hw: Tuple[int, int],
                       preprocess: bool = True, with_peaks: bool = True,
                       with_detections: bool = True):
    """Build a jitted image -> (heatmaps, detections, peaks) function.

    Static over the input (H, W); anchors are baked in as constants.
    `with_peaks=False` skips the device peak finder (peaks=None in the
    output) — the multi-scale eval path averages heatmaps on the host and
    finds peaks there (reference tester.py:299-305), so computing device
    peaks per scale would be wasted work.  `with_detections=False`
    additionally skips the RetinaNet heads + decode + NMS entirely
    (detections=None) — the coco_eval protocol consumes boxes from the
    scale-1.0 forward ONLY (reference tester.py:169), so the other
    scales' detection branch (~a quarter of their FLOPs) is dead work.
    """
    anchors = (jnp.asarray(anchors_for_shape(tuple(image_hw), cfg.anchors))
               if with_detections else None)
    h, w = image_hw
    det = cfg.detection
    pk = cfg.peaks
    stride = cfg.data.feat_stride

    @jax.jit
    def run(params, images) -> PipelineOutput:
        x = preprocess_on_device(images) if preprocess else images
        dets = None
        if with_detections:
            predict_keypoint, cls, reg = model.apply(
                params, x, method=PoseNet.full_forward)
            boxes = decode_boxes(anchors[None], reg)
            boxes = clip_boxes(boxes, h, w)
            scores = jnp.max(cls, axis=2)  # (B, A) person prob
            if det.use_pallas_nms and jax.default_backend() == "tpu":
                from multiposenet_tpu.ops.pallas_nms import nms_fixed_pallas
                dets = jax.vmap(lambda b, s: nms_fixed_pallas(
                    b, s, det.nms_thresh, det.max_detections,
                    det.score_thresh, interpret=False))(boxes, scores)
            else:
                dets = batched_topk_nms(boxes, scores,
                                        iou_thresh=det.nms_thresh,
                                        max_out=det.max_detections,
                                        score_thresh=det.score_thresh)
        else:
            # saved_for_loss and the detection-FPN features are traced but
            # unused -> XLA dead-code-eliminates them from the compiled graph
            predict_keypoint, _ = model.apply(
                params, x, False, method=PoseNet.keypoint_forward)

        peaks = None
        if with_peaks:
            # natively batched (NOT vmapped): keeps the top-k rank-2 so
            # XLA's TPU TopK fast path fires (see find_peaks_refined_batched)
            peaks = find_peaks_refined_batched(
                predict_keypoint, thre1=pk.thre1,
                max_peaks=pk.max_peaks_per_joint, upsamp_factor=stride,
                win_size=pk.win_size, refine=pk.refine)
        return PipelineOutput(predict_keypoint, dets, peaks)

    return run


def make_sharded_pipeline(model: PoseNet, cfg: Config,
                          image_hw: Tuple[int, int], mesh,
                          preprocess: bool = True):
    """Data-parallel inference over a device mesh: params replicated,
    image batch sharded on the batch axis — multi-chip serving throughput
    scales linearly over ICI with zero collectives in the forward."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    base = make_full_pipeline(model, cfg, image_hw, preprocess=preprocess)
    rep = NamedSharding(mesh, P())
    dat = NamedSharding(mesh, P("data"))

    @functools.partial(jax.jit, in_shardings=(rep, dat), out_shardings=dat)
    def run(params, images) -> PipelineOutput:
        return base.__wrapped__(params, images)

    return run


def make_keypoint_pipeline(model: PoseNet, cfg: Config, preprocess: bool = True):
    """Heatmap-only forward (multi-scale eval path; no NMS/peaks).

    Shape-polymorphic via retracing per padded bucket shape.
    """

    @jax.jit
    def run(params, images):
        x = preprocess_on_device(images) if preprocess else images
        predict_keypoint, cls, reg = model.apply(
            params, x, method=PoseNet.full_forward)
        return predict_keypoint, cls, reg

    return run


# ----------------------------------------------------------------------
# Full demo-equivalent pipeline: images -> grouped people, one dispatch.
# ----------------------------------------------------------------------

# 18-joint internal order -> 17 joints: drop the synthesized neck (joint 1)
# and shift the rest down (reference evaluate/tester.py:160-167)
NECK_DROP_17 = np.array([0] + list(range(2, 18)), np.int32)


class PoseAssignments(NamedTuple):
    """Per-image batched device grouping outputs (see ops/grouping.py).

    Everything the host needs to emit the reference's prn_result rows —
    one `jax.device_get` of this tuple plus `eval.grouping.format_assignment`
    per image completes the demo protocol (tester.py:195-254)."""
    chosen: jnp.ndarray       # (B, maxb, 17) int32 peak slot per joint, -1
    active_any: jnp.ndarray   # (B, 17) bool joint type has any scored peak
    active: jnp.ndarray       # (B, maxb, 17, P) bool
    fallback_xy: jnp.ndarray  # (B, maxb, 17, 2) PRN-argmax fallback coords
    peak_xy: jnp.ndarray      # (B, 17, P, 2) original-image pixel coords
    peak_valid: jnp.ndarray   # (B, 17, P) bool
    boxes_xywh: jnp.ndarray   # (B, maxb, 4) original-image scale
    box_valid: jnp.ndarray    # (B, maxb) bool (a score-desc PREFIX)


def make_e2e_pose_pipeline(model: PoseNet, cfg: Config,
                           image_hw: Tuple[int, int],
                           preprocess: bool = True):
    """images -> grouped-person assignments: the ENTIRE demo path
    (reference evaluate/tester.py:195-254 incl. prn_process tester.py:333-429)
    as ONE jitted dispatch per batch.

    Covers: preprocess -> FPN forward -> anchor decode -> NMS -> heatmap
    peaks -> neck drop/17-joint reindex -> detection test-threshold + crowd
    cap -> batched PRN grids -> PRN forward -> per-peak score tables ->
    on-device greedy mutual-best assignment.  Only `format_assignment`
    (O(people x joints) host dict building) remains outside the graph.

    `scales` maps model-input pixels back to original-image pixels per image
    (the reference scales joints AND boxes on host before prn_process,
    tester.py:221,241 — scaling changes PRN cell geometry via ceil(w), so it
    must happen before the PRN stage, not after).  Pass ones for square
    inputs already at model resolution.

    Returns (PipelineOutput, PoseAssignments).
    """
    base = make_full_pipeline(model, cfg, image_hw, preprocess=preprocess)
    prn = make_prn_pipeline(model, cfg)
    from multiposenet_tpu.ops.grouping import assign_peaks

    maxb = cfg.prn.max_people
    test_thresh = cfg.detection.test_score_thresh
    sel = jnp.asarray(NECK_DROP_17)

    @jax.jit
    def run(params, images, scales) -> Tuple[PipelineOutput, PoseAssignments]:
        out = base.__wrapped__(params, images)
        s = scales.astype(jnp.float32)[:, None, None]

        # peaks: 18 -> 17 joints; the device top-k emits valid peaks as a
        # score-descending prefix, matching the host joint-list bucketing
        # order (evaluator._joints_to_peak_arrays)
        pxy = out.peaks.coords[:, sel] * s[..., None]
        pvalid = out.peaks.valid[:, sel]
        # every peak enters the PRN table with confidence 1 (tester.py:345)
        pscore = jnp.where(pvalid, 1.0, -1.0)

        # detections: NMS keeps suppressed slots in place (scores -1), so
        # compact kept boxes to a score-desc prefix, apply the demo test
        # threshold (tester.py:236), cap at max_people, convert to xywh in
        # original-image coordinates
        order = jnp.argsort(-out.detections.scores, axis=1)[:, :maxb]
        dsc = jnp.take_along_axis(out.detections.scores, order, axis=1)
        dbx = jnp.take_along_axis(out.detections.boxes, order[..., None],
                                  axis=1) * s
        bvalid = dsc > test_thresh
        xywh = jnp.concatenate(
            [dbx[..., :2], dbx[..., 2:] - dbx[..., :2]], axis=-1)
        xywh = jnp.where(bvalid[..., None], xywh, 0.0)

        def one(pp_xy, pp_score, pp_valid, bxs, bv):
            table, inside, prn_out, x0, y0 = prn.__wrapped__(
                params, pp_xy, pp_score, pp_valid, bxs, bv)
            return assign_peaks(table, inside, x0, y0, prn_out, bxs)

        a = jax.vmap(one)(pxy, pscore, pvalid, xywh, bvalid)
        return out, PoseAssignments(
            chosen=a.chosen, active_any=a.active_any, active=a.active,
            fallback_xy=a.fallback_xy, peak_xy=pxy, peak_valid=pvalid,
            boxes_xywh=xywh, box_valid=bvalid)

    return run


def make_sharded_e2e_pipeline(model: PoseNet, cfg: Config,
                              image_hw: Tuple[int, int], mesh,
                              preprocess: bool = True):
    """Mesh-sharded make_e2e_pose_pipeline: params replicated, image batch
    (and every per-image output) sharded on the batch axis — one predictor
    saturates a whole slice with zero collectives in the forward."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    base = make_e2e_pose_pipeline(model, cfg, image_hw, preprocess=preprocess)
    rep = NamedSharding(mesh, P())
    dat = NamedSharding(mesh, P("data"))

    @functools.partial(jax.jit, in_shardings=(rep, dat, dat),
                       out_shardings=dat)
    def run(params, images, scales):
        return base.__wrapped__(params, images, scales)

    return run


def format_pose_batch(assigns: PoseAssignments, file_names=None,
                      image_ids=None):
    """Host tail of the e2e pipeline: fetched PoseAssignments -> per-image
    person result lists (reference prn_result rows).  `assigns` must already
    be on host (pass through jax.device_get first — ONE transfer per batch)."""
    from multiposenet_tpu.eval.grouping import format_assignment

    n = assigns.box_valid.shape[0]
    file_names = file_names or [""] * n
    image_ids = image_ids or [0] * n
    results = []
    for i in range(n):
        nb = int(np.asarray(assigns.box_valid[i]).sum())  # valid is a prefix
        active = np.asarray(assigns.active[i, :nb])
        results.append(format_assignment(
            np.asarray(assigns.chosen[i, :nb]),
            active.any(axis=(0, 2)) if nb else np.asarray(assigns.active_any[i]),
            active,
            np.asarray(assigns.fallback_xy[i, :nb]),
            np.asarray(assigns.peak_xy[i]),
            np.asarray(assigns.boxes_xywh[i, :nb]),
            file_name=file_names[i], image_id=image_ids[i]))
    return results


# ----------------------------------------------------------------------
# PRN stage: build per-person input grids, run PRN, score peaks — one jit.
# ----------------------------------------------------------------------

def _prn_mlp_eval(prn_params, grids: jnp.ndarray, compute_dtype):
    """Eval-mode PRN MLP (subnets.py PRN.__call__, train=False) with the
    flatten FUSED into the boundary Denses.

    The module path reshapes (B, gh, gw, 17) -> (B, d) -> Dense -> ... ->
    (B, d) -> (B, gh, gw, 17); in the batched e2e graph the two reshapes
    materialize as layout copies (~2 ms/exec at batch 64, docs/PERF.md
    round-4 trace).  Here dens1/dens2 contract the (y, x, j) axes directly
    (kernels reshaped at trace time — the flatten order is the same
    C-order (y, x, j) the module's reshape(b, -1) walks, so this is the
    SAME dot product on the SAME checkpoint params), the residual adds in
    4D, and the whole-vector softmax normalizes jointly over (y, x, j) —
    elementwise-identical to softmax over the flat vector.  Dropout is
    deterministic at eval and drops out of the graph entirely.

    Training keeps the module (dropout rng + the oracle's strict f64
    gradient-identity tests run through PRN.__call__).
    """
    gh, gw, nj = grids.shape[1:]
    dt = compute_dtype
    x = grids.astype(dt)
    k1 = prn_params["dens1"]["kernel"].reshape(gh, gw, nj, -1).astype(dt)
    h = jax.nn.relu(jnp.einsum("byxj,yxjn->bn", x, k1)
                    + prn_params["dens1"]["bias"].astype(dt))
    h = jax.nn.relu(h @ prn_params["bneck"]["kernel"].astype(dt)
                    + prn_params["bneck"]["bias"].astype(dt))
    k2 = prn_params["dens2"]["kernel"].reshape(-1, gh, gw, nj).astype(dt)
    o = jax.nn.relu(jnp.einsum("bn,nyxj->byxj", h, k2)
                    + prn_params["dens2"]["bias"].reshape(gh, gw, nj)
                    .astype(dt))
    o = o + x
    # whole-vector softmax pinned >= f32 (subnets.py PRN.__call__); the
    # joint (1, 2, 3) axis group == the module's axis=1 on the flat vector
    of = o.astype(jnp.promote_types(o.dtype, jnp.float32))
    return jax.nn.softmax(of, axis=(1, 2, 3))

def _grid_coords(peak_xy, box_xywh, grid_h: int, grid_w: int):
    """Map a peak into a person crop grid with the reference's int-cast and
    edge-clamping rules (tester.py:374-391, prn_data_pipeline.py:51-70).

    box is (x, y, w, h).  Returns (x0, y0) int32 cell coords.
    """
    x_scale = grid_w / jnp.ceil(box_xywh[2])
    y_scale = grid_h / jnp.ceil(box_xywh[3])
    # python int() truncates toward zero — replicate exactly
    fx = (peak_xy[0] - box_xywh[0]) * x_scale
    fy = (peak_xy[1] - box_xywh[1]) * y_scale
    x0 = jnp.trunc(fx).astype(jnp.int32)
    y0 = jnp.trunc(fy).astype(jnp.int32)
    x0 = jnp.clip(x0, 0, grid_w - 1)
    y0 = jnp.clip(y0, 0, grid_h - 1)
    return x0, y0


def make_prn_pipeline(model: PoseNet, cfg: Config):
    """Build a jitted (peaks, boxes) -> PRN outputs + per-peak score tables.

    Inputs (fixed capacity, padded):
      peak_xy     (J=17, P, 2) float  peak coords in image pixels
      peak_score  (J, P) float        -1 for invalid slots
      peak_valid  (J, P) bool
      boxes_xywh  (B, 4) float        person boxes
      box_valid   (B,) bool

    Outputs:
      score_table (B, J, P) float  score of assigning peak p of joint j to
                                   box b (0 where peak not inside box)
      inside      (B, J, P) bool
      prn_out     (B, gh, gw, 17)  raw PRN output grids (for the no-peak
                                   fallback branch, tester.py:472-483)
    """
    gh, gw = cfg.model.prn_height, cfg.model.prn_width
    in_thres = cfg.prn.in_thres
    nwin = cfg.prn.score_window
    half = (nwin - 1) // 2
    # Grid-build dtype: under a bf16 compute dtype the PRN MLP rounds its
    # input grids to bf16 anyway (subnets.py PRN.__call__ astype), so the
    # one-hot counts and blur matmuls run in bf16 directly — per-cell
    # counts are <= max_peaks <= 256 and exact in bf16's 8-bit
    # significand, and rounding the blur weights (<= 2^-9 relative) sits
    # below the quantization the grids already undergo at the MLP
    # boundary.  Keeping f32 intermediates only to round them there cost
    # ~4 ms/exec of layout copies + a convert on the (64, 20, 56, 36, 17)
    # tensors in the batched e2e graph (docs/PERF.md round-4 trace).  f32
    # configs keep the f32 HIGHEST build bit-exactly as before — the eval
    # default path is untouched.
    grid_dt = (jnp.bfloat16 if cfg.model.compute_dtype == jnp.bfloat16
               else jnp.float32)
    grid_prec = (None if grid_dt == jnp.bfloat16
                 else jax.lax.Precision.HIGHEST)

    @jax.jit
    def run(params, peak_xy, peak_score, peak_valid, boxes_xywh, box_valid):
        num_b = boxes_xywh.shape[0]
        num_j, num_p = peak_score.shape

        bx = boxes_xywh[:, 0][:, None, None]
        by = boxes_xywh[:, 1][:, None, None]
        bw = boxes_xywh[:, 2][:, None, None]
        bh = boxes_xywh[:, 3][:, None, None]
        px = peak_xy[None, :, :, 0]
        py = peak_xy[None, :, :, 1]

        inside = (
            (px > bx - bw * in_thres) & (px < bx + bw * (1.0 + in_thres)) &
            (py > by - bh * in_thres) & (py < by + bh * (1.0 + in_thres)) &
            peak_valid[None] & box_valid[:, None, None]
        )  # (B, J, P)

        x_scale = gw / jnp.ceil(bw)
        y_scale = gh / jnp.ceil(bh)
        x0 = jnp.clip(jnp.trunc((px - bx) * x_scale).astype(jnp.int32), 0, gw - 1)
        y0 = jnp.clip(jnp.trunc((py - by) * y_scale).astype(jnp.int32), 0, gh - 1)

        # build the (B, gh, gw, J) mark grids as a one-hot MXU contraction.
        # A scatter-max formulation is fine dispatched per image (27us/call
        # standalone) but under the batch-64 fused e2e graph TPU executes
        # the batched scatter serially (measured 6.4 ms/exec) plus layout
        # copies around it; the 0/1 one-hot contraction runs on the MXU and
        # min(.,1) reproduces the max-dedupe exactly (equivalence tests:
        # tests/test_ops.py::test_onehot_contraction_*).
        hi = jax.lax.Precision.HIGHEST
        insf = inside.astype(grid_dt)
        oh_y = (y0[..., None] == jnp.arange(gh)).astype(grid_dt)
        oh_x = (x0[..., None] == jnp.arange(gw)).astype(grid_dt)
        by = jnp.asarray(blur_matrix(gh, 1.0, "nearest"), grid_dt)
        bx = jnp.asarray(blur_matrix(gw, 1.0, "nearest"), grid_dt)
        # default precision is EXACT here: operands are 0/1 (no bf16
        # truncation possible) and the MXU accumulates in f32, so the
        # integer counts (<= P) are exact without HIGHEST's extra passes.
        # (A scatter-max formulation is serialized on TPU and the
        # depthwise-conv blur shuffles through bad layouts — both
        # measured, docs/PERF.md; the blur matmuls are ~8 GFLOPs of MXU
        # work and blur_matrix == the separable conv exactly,
        # tests/test_ops.py.)  This byxj chain is also the round-5 layout
        # A/B winner: natural-dot-order "bjyx" intermediates with one
        # explicit pre-MLP transpose measured +0.2 ms, the fused-flatten
        # MLP +2.7 ms — the residual ~2 ms of layout copies around the
        # window einsums is XLA-mandated for this op mix (docs/PERF.md
        # "Round-5 PRN layout A/B").
        cnt = jnp.einsum("bjpy,bjpx->byxj", oh_y * insf[..., None], oh_x)
        marks = jnp.minimum(cnt, jnp.asarray(1.0, grid_dt))
        g1 = jnp.einsum("yh,bhxj->byxj", by, marks, precision=grid_prec)
        grids = jnp.einsum("xw,bywj->byxj", bx, g1, precision=grid_prec)

        if cfg.prn.fused_mlp:
            prn_out = _prn_mlp_eval(params["params"]["prn"], grids,
                                    cfg.model.compute_dtype)
        else:
            prn_out = model.apply(params, grids, method=PoseNet.prn_forward)

        # score each marked peak: sum over a clipped NxN window of the PRN
        # output around the peak cell, times the peak score (tester.py:410-429).
        # The window sum is a masked row/column contraction — a summed-area
        # table + 4 corner gathers is O(1) per peak on paper, but each
        # batched corner gather executes as ~700k serialized scalar loads
        # on TPU (measured 4 x 14 ms/exec at batch 64); the interval-mask
        # einsum pair is ~3 GFLOPs of MXU work instead, and sums the window
        # directly like the reference's np.sum (no SAT cancellation).
        y1 = jnp.clip(y0 - half, 0, gh)
        y2 = jnp.clip(y0 + half + 1, 0, gh)
        x1 = jnp.clip(x0 - half, 0, gw)
        x2 = jnp.clip(x0 + half + 1, 0, gw)
        ry = ((jnp.arange(gh) >= y1[..., None]) &
              (jnp.arange(gh) < y2[..., None])).astype(jnp.float32)  # (B,J,P,gh)
        cx = ((jnp.arange(gw) >= x1[..., None]) &
              (jnp.arange(gw) < x2[..., None])).astype(jnp.float32)  # (B,J,P,gw)
        t = jnp.einsum("bjpy,byxj->bjpx", ry,
                       prn_out.astype(jnp.float32), precision=hi)
        ws = jnp.einsum("bjpx,bjpx->bjp", t, cx, precision=hi)
        table = jnp.where(inside, ws * peak_score[None], 0.0)
        return table, inside, prn_out, x0, y0

    return run
