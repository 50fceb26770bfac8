"""Evaluator — the reference Tester (evaluate/tester.py:106-581) rebuilt.

Three modes:
  test()      single-scale demo inference over an image directory
  coco_eval() multi-scale + flip COCO keypoint evaluation (OKS AP)
  val()       per-subnet loss over a validation loader (Trainer.validate)

Device/host split (see engine/inference.py): backbone+heads+NMS(+peaks) and
the whole PRN stage are single jitted calls; variable-resolution heatmap
averaging and the greedy grouping run on host exactly as the reference.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from multiposenet_tpu.config import Config
from multiposenet_tpu.data.coco_json import COCOIndex
from multiposenet_tpu.engine.inference import (
    make_full_pipeline,
    make_prn_pipeline,
)
from multiposenet_tpu.eval.cocoeval import KeypointEval
from multiposenet_tpu.eval.grouping import group_peaks, to_coco_order
from multiposenet_tpu.eval.multiscale import (
    SWAP_HEAT_18,
    average_flip_heat,
    crop_shape_only,
    crop_with_factor,
    get_multipliers,
    joint_list_from_heatmaps,
    resize_heatmap_to_original,
)
from multiposenet_tpu.eval.render import plot_results
from multiposenet_tpu.models.posenet import PoseNet
from multiposenet_tpu.utils.logging import logger

NUM_J17 = 17


def det_scale_idx(n_scales: int) -> int:
    """Index of the ONE scale whose detections coco_eval consumes — scale
    1.0, i.e. scale_search index 1 (reference tester.py:169; index 0 when
    only one scale is configured).  Shared by precompile's variant
    derivation, both dispatch paths, and _finish_image: they MUST agree."""
    return min(1, n_scales - 1)


def _joints_to_peak_arrays(joint_list: Sequence[Sequence[float]],
                           max_peaks: int, context: str = ""
                           ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """[x, y, score, id, joint_type(17)] rows -> padded (17, P, 2)/(17, P)
    arrays for the device PRN stage.  Peak order within a joint follows the
    input order (the reference's instance order).  The reference processes
    an unbounded peak list (tester.py:338-350); overflowing the fixed
    capacity here is LOGGED, never silent."""
    peak_xy = np.zeros((NUM_J17, max_peaks, 2), np.float32)
    peak_valid = np.zeros((NUM_J17, max_peaks), bool)
    counts = [0] * NUM_J17
    dropped = 0
    for row in joint_list:
        t = int(row[4])
        if counts[t] < max_peaks:
            peak_xy[t, counts[t]] = (row[0], row[1])
            peak_valid[t, counts[t]] = True
            counts[t] += 1
        else:
            dropped += 1
    if dropped:
        logger.warning(
            "%s: dropped %d peak(s) over the per-joint capacity %d — raise "
            "cfg.peaks.escalate_max_peaks (or max_peaks_per_joint) to "
            "process this crowd fully", context or "image", dropped,
            max_peaks)
    # reference prn_process enters every peak with confidence 1 (tester.py:345)
    peak_score = np.where(peak_valid, 1.0, -1.0).astype(np.float32)
    return peak_xy, peak_score, peak_valid


def peak_arrays_to_joint_list(coords: np.ndarray, scores: np.ndarray,
                              valid: np.ndarray, scale: float = 1.0
                              ) -> List[List[float]]:
    """Device PeakSet arrays (J, P, 2)/(J, P) -> reference joint-list rows
    [x, y, score, id, joint_type] (joint_utils.py:141-152).  Peak ids are
    assigned in (joint, slot) order — the device top-k emits slots in
    score-descending order where the reference's host scan is y-major."""
    full = np.asarray(valid).all(axis=1)
    if full.any():
        logger.warning(
            "device peak capacity saturated for joint type(s) %s "
            "(capacity %d): the on-device top-k may have truncated "
            "lower-scoring peaks — raise cfg.peaks.escalate_max_peaks "
            "(coco_eval re-dispatches saturated images at that tier "
            "automatically when it is set)",
            np.where(full)[0].tolist(), valid.shape[1])
    joint_list = []
    pid = 0
    for j in range(coords.shape[0]):
        for p in range(coords.shape[1]):
            if valid[j, p]:
                joint_list.append([float(coords[j, p, 0]) * scale,
                                   float(coords[j, p, 1]) * scale,
                                   float(scores[j, p]), pid, j])
                pid += 1
    return joint_list


def drop_neck(joint_list: np.ndarray) -> List[List[float]]:
    """18-joint rows -> 17-joint rows (reference tester.py:160-167)."""
    out = []
    for row in np.asarray(joint_list).reshape(-1, 5).tolist():
        if int(row[-1]) != 1:
            row[-1] = max(0, int(row[-1]) - 1)
            out.append(row)
    return out


class Evaluator:
    def __init__(self, cfg: Config, model: Optional[PoseNet] = None,
                 params=None):
        self.cfg = cfg
        self.model = model or PoseNet(cfg.model)
        self.params = params
        # keyed (h, w, with_peaks, with_detections)
        self._pipelines: Dict[Tuple[int, int, bool, bool], callable] = {}
        self._prn_pipeline = None
        self._assign_jit = None
        self._prn_assign_jit = None
        self._accum_jit = None
        self._fold_jit = None
        # device-buffer caches (_resize_mat_cache, _pyramid_jits,
        # _pyramid_args_cache) are created lazily via __dict__.setdefault in
        # their accessors so tests built with Evaluator.__new__ work too

    # ------------------------------------------------------------------

    def pipeline(self, hw: Tuple[int, int], with_peaks: bool = True,
                 with_detections: bool = True):
        key = (int(hw[0]), int(hw[1]), with_peaks, with_detections)
        if key not in self._pipelines:
            self._pipelines[key] = make_full_pipeline(
                self.model, self.cfg, key[:2], with_peaks=with_peaks,
                with_detections=with_detections)
        return self._pipelines[key]

    def prn_pipeline(self):
        if self._prn_pipeline is None:
            self._prn_pipeline = make_prn_pipeline(self.model, self.cfg)
        return self._prn_pipeline

    def assign_fn(self):
        """Cached jit of the device grouping kernel — a fresh jax.jit wrapper
        per image would retrace every call."""
        if self._assign_jit is None:
            from multiposenet_tpu.ops.grouping import assign_peaks
            self._assign_jit = jax.jit(assign_peaks)
        return self._assign_jit

    def prn_assign_pipeline(self):
        """PRN stage + device grouping fused into ONE jitted dispatch (and
        one fetch) per image — separate dispatches cost an extra tunnel
        round-trip each on remote runtimes."""
        if self._prn_assign_jit is None:
            from multiposenet_tpu.ops.grouping import assign_peaks
            base = self.prn_pipeline()

            @jax.jit
            def run(params, peak_xy, peak_score, peak_valid, boxes,
                    box_valid):
                table, inside, prn_out, x0, y0 = base.__wrapped__(
                    params, peak_xy, peak_score, peak_valid, boxes, box_valid)
                return assign_peaks(table, inside, x0, y0, prn_out, boxes)
            self._prn_assign_jit = run
        return self._prn_assign_jit

    def accum_fn(self):
        """Cached jit of the device resize+accumulate step (one compile per
        (scale-bucket, orig-bucket) shape pair): two cv2-exact bicubic
        matmuls (ops/resize.py) + running sum, keeping the whole multi-scale
        heatmap average on the TPU."""
        if self._accum_jit is None:
            @jax.jit
            def accum(avg, hms, rh, rwt):
                r = jnp.einsum("oh,bhwc,wx->boxc", rh, hms, rwt,
                               precision=jax.lax.Precision.HIGHEST)
                return avg + r
            self._accum_jit = accum
        return self._accum_jit

    def fold_fn(self):
        """Cached jit of the final fold on the padded running sum: divide by
        #scales and (with flip) average in the un-flipped, channel-swapped
        mirror map about the DYNAMIC valid width (reference
        tester.py:318-331) — so only ONE padded (Hp, Wp, 18) map leaves the
        device and the host crops to (h, w).  The valid size is a traced
        scalar: ONE compile per padded bucket, not one per image size."""
        if self._fold_jit is None:
            import functools
            swap = jnp.asarray(SWAP_HEAT_18)

            @functools.partial(jax.jit, static_argnums=(3,))
            def fold(avg, h, w, with_flip, inv_n):
                wp = avg.shape[2]
                v = avg * inv_n
                if with_flip:
                    # mirror about the valid width w; columns >= w carry
                    # garbage and are cropped away on host
                    cols = jnp.clip(w - 1 - jnp.arange(wp), 0, wp - 1)
                    return (v[0] + v[1][:, cols, :][:, :, swap]) / 2.0
                return v[0]
            self._fold_jit = fold
        return self._fold_jit

    def _fused_fold_peaks_body(self, max_peaks: Optional[int] = None):
        """Untraced body shared by the single-image and group jits: every
        scale's cv2-exact bicubic resize-to-original (two MXU matmuls
        each), the sum, the /n + flip fold (mirror about the DYNAMIC valid
        width, channel swap), pad masking, and ON-DEVICE peak finding.
        `max_peaks` overrides the base per-joint peak capacity (the crowd
        escalation tier re-dispatches saturated images through a variant
        built with cfg.peaks.escalate_max_peaks)."""
        from multiposenet_tpu.ops.peaks import find_peaks_refined
        swap = jnp.asarray(SWAP_HEAT_18)
        thre1 = self.cfg.peaks.thre1
        max_peaks = max_peaks or self.cfg.peaks.max_peaks_per_joint
        win = self.cfg.peaks.win_size
        hi = jax.lax.Precision.HIGHEST

        def run(hms, mats, h, w, with_flip, inv_n):
            acc = None
            for hm, (rh, rwt) in zip(hms, mats):
                r = jnp.einsum("oh,bhwc,wx->boxc", rh, hm, rwt,
                               precision=hi)
                acc = r if acc is None else acc + r
            hp, wp = acc.shape[1], acc.shape[2]
            v = acc * inv_n
            if with_flip:
                # mirror about the valid width w (dynamic): original
                # column x lives at flipped-map column w-1-x; columns
                # >= w are garbage and zeroed by the mask below
                cols = jnp.clip(w - 1 - jnp.arange(wp), 0, wp - 1)
                heat = (v[0] + v[1][:, cols, :][:, :, swap]) / 2.0
            else:
                heat = v[0]
            mask = ((jnp.arange(hp)[:, None] < h)
                    & (jnp.arange(wp)[None, :] < w))
            heat = jnp.where(mask[:, :, None], heat, 0.0)
            return find_peaks_refined(heat, thre1, max_peaks,
                                      upsamp_factor=1, win_size=win,
                                      refine=self.cfg.peaks.refine)
        return run

    def accum_fold_peaks_fn(self, max_peaks: Optional[int] = None):
        """Cached jit of the WHOLE post-forward multi-scale reduction as one
        exec (`_fused_fold_peaks_body`) — so per image a single small
        dispatch replaces 5 accum execs + a fold exec (each paying per-exec
        overhead on a padded full-res buffer), and only compact (J, P) peak
        arrays leave the device instead of a full-resolution float map
        (22 MB and 0.5-1 s per image on a remote runtime).

        The valid size (h, w) is a traced scalar, so there is ONE compile
        per (scale-shape combo, padded bucket) — a bounded set `precompile`
        warms — rather than one per distinct original image size.  Peaks
        land directly in original-image coordinates; border-window
        semantics are the documented ops/peaks.py deviation (<=1px within
        2px of the border).

        One cached jit per peak capacity: `max_peaks=None` is the base
        tier; the crowd-escalation re-dispatch passes
        cfg.peaks.escalate_max_peaks."""
        import functools
        cache = self.__dict__.setdefault("_accum_fold_peaks_jits", {})
        key = max_peaks or self.cfg.peaks.max_peaks_per_joint
        if key not in cache:
            cache[key] = functools.partial(jax.jit, static_argnums=(4,))(
                self._fused_fold_peaks_body(max_peaks))
        return cache[key]

    def accum_fold_peaks_group_fn(self):
        """EXPERIMENTAL grouped variant — see engine/grouped_eval.py."""
        from multiposenet_tpu.engine import grouped_eval
        return grouped_eval.accum_fold_peaks_group_fn(self)

    def _pyramid_fn(self, out_shapes, with_flip: bool):
        """Cached jit building the WHOLE multi-scale image pyramid on device
        from one uploaded original: per scale, a vertical + horizontal
        gather-lerp with cv2's classic INTER_LINEAR taps/weights (host-
        computed exactly in float64, ops/resize.linear_resize_coeffs),
        round-to-u8, and 128-fill of the pad region; the flip batch row
        reuses the vertical pass and mirrors only the horizontal gather
        indices (exactly equal to resizing the pre-flipped image).

        Replaces ~26 MB of per-image host-resized scale uploads (the
        dominant main-thread cost on remote runtimes) with one ~1 MB
        original + ~50 KB of coefficients.  Within 1 u8 LSB of the host cv2
        chain (tests/test_eval.py)."""
        jits = self.__dict__.setdefault("_pyramid_jits", {})
        key = (tuple(out_shapes), bool(with_flip))
        if key not in jits:
            jits[key] = jax.jit(self._pyramid_body(out_shapes, with_flip))
        return jits[key]

    def _pyramid_body(self, out_shapes, with_flip: bool):
        def run(src, ipack, wpack, dims):
            srcf = src.astype(jnp.float32)
            outs = []
            io = wo = 0
            for k, (dh, dw) in enumerate(out_shapes):
                iy0 = ipack[io:io + dh]
                iy1 = ipack[io + dh:io + 2 * dh]
                io += 2 * dh
                ix0 = ipack[io:io + dw]
                ix1 = ipack[io + dw:io + 2 * dw]
                io += 2 * dw
                if with_flip:
                    ix0f = ipack[io:io + dw]
                    ix1f = ipack[io + dw:io + 2 * dw]
                    io += 2 * dw
                wy = wpack[wo:wo + dh]
                wx = wpack[wo + dh:wo + dh + dw]
                wo += dh + dw
                g = (srcf[iy0] * wy[:, None, None]
                     + srcf[iy1] * (1.0 - wy)[:, None, None])

                def horiz(a0, a1):
                    return (g[:, a0] * wx[None, :, None]
                            + g[:, a1] * (1.0 - wx)[None, :, None])

                imgs = [horiz(ix0, ix1)]
                if with_flip:
                    imgs.append(horiz(ix0f, ix1f))
                b = jnp.stack(imgs)
                b = jnp.clip(jnp.floor(b + 0.5), 0.0, 255.0
                             ).astype(jnp.uint8)
                valid = ((jnp.arange(dh)[:, None] < dims[k, 0])
                         & (jnp.arange(dw)[None, :] < dims[k, 1]))
                outs.append(jnp.where(valid[None, :, :, None], b,
                                      jnp.uint8(128)))
            return tuple(outs)
        return run

    # bound on device-resident cached buffers: ~256 resize-matrix pairs is
    # ~0.4 GB HBM worst-case; evicted LRU so arbitrarily varied image sizes
    # (full val2017 has hundreds) cannot accrete unboundedly.  Group caches
    # hold G-stacked entries and divide this bound by G (same budget)
    _DEV_CACHE_MAX = 256

    def _lru(self, name: str, key, make, maxn: Optional[int] = None):
        """Bounded LRU on self.__dict__[name] (setdefault so instances built
        with Evaluator.__new__ in tests work too).  `maxn` overrides the
        default bound — group caches hold G-stacked entries and scale it
        down by G so the HBM budget stays ~constant."""
        from collections import OrderedDict
        cache = self.__dict__.setdefault(name, OrderedDict())
        if key in cache:
            cache.move_to_end(key)
        else:
            cache[key] = make()
            while len(cache) > (maxn or self._DEV_CACHE_MAX):
                cache.popitem(last=False)
        return cache[key]

    def _pyramid_args_np(self, h: int, w: int, dests, bucket: int,
                         with_flip: bool):
        """Packed host coefficient buffers + per-scale metadata for
        `_pyramid_body`, LRU-cached per (image size, scale set).  Returns
        (ipack int32, wpack float32, dims (S, 2) int32,
        metas: ((DH, DW), (rh, rw), im_scale))."""
        from multiposenet_tpu.ops.resize import linear_resize_coeffs
        key = (h, w, tuple(round(float(d), 6) for d in dests), bucket,
               bool(with_flip))

        def make():
            ints, flts, dims, metas = [], [], [], []

            def pad_to(a, n):
                return np.pad(a, (0, n - len(a)))

            for dest in dests:
                (dh, dw), im_scale, (rh, rw) = crop_shape_only(
                    (h, w), dest, factor=32, bucket=bucket)
                iy0, iy1, wy = linear_resize_coeffs(h, rh)
                ix0, ix1, wx = linear_resize_coeffs(w, rw)
                ints += [pad_to(iy0, dh), pad_to(iy1, dh),
                         pad_to(ix0, dw), pad_to(ix1, dw)]
                if with_flip:
                    # img_f[x] == img[w-1-x]: mirroring the gather indices
                    # IS resizing the flipped original
                    ints += [pad_to(w - 1 - ix0, dw),
                             pad_to(w - 1 - ix1, dw)]
                flts += [pad_to(wy, dh), pad_to(wx, dw)]
                dims.append((rh, rw))
                metas.append(((dh, dw), (rh, rw), im_scale))
            return (np.concatenate(ints).astype(np.int32),
                    np.concatenate(flts).astype(np.float32),
                    np.asarray(dims, np.int32), tuple(metas))
        return key, self._lru("_pyramid_np_cache", key, make)

    def _pyramid_host_args(self, h: int, w: int, dests, bucket: int,
                           with_flip: bool):
        """`_pyramid_args_np` uploaded as DEVICE-resident arrays, LRU-cached
        — images of the same size reuse the buffers without re-uploading
        ~50 KB each."""
        key, (ints, flts, dims, metas) = self._pyramid_args_np(
            h, w, dests, bucket, with_flip)
        return self._lru("_pyramid_args_cache", key, lambda: (
            jnp.asarray(ints), jnp.asarray(flts), jnp.asarray(dims),
            metas))

    def _resize_mats_np(self, key):
        """Host resize-matrix pair for one (scale, original) shape combo,
        LRU-cached (shared source for the single and group device caches)."""
        from multiposenet_tpu.ops.resize import heatmap_resize_mats
        return self._lru("_resize_mat_np_cache", key,
                         lambda: heatmap_resize_mats(*key))

    def _resize_mats_dev(self, s4h, s4w, real_h, real_w, h, w, hp, wp):
        """Device-resident resize matrices, LRU-cached across images — the
        same (scale, original) shape pair recurs for every image of a size,
        and re-uploading ~1.5 MB of constant matrices per image costs real
        time on remote runtimes."""
        key = (s4h, s4w, real_h, real_w, h, w, hp, wp)
        mats = self._resize_mats_np(key)
        return self._lru("_resize_mat_cache", key, lambda: (
            jnp.asarray(mats[0]), jnp.asarray(mats[1])))

    def _resize_mats_group_dev(self, keys):
        """EXPERIMENTAL grouped variant — see engine/grouped_eval.py."""
        from multiposenet_tpu.engine import grouped_eval
        return grouped_eval.resize_mats_group_dev(self, keys)

    # ------------------------------------------------------------------

    def _prn_capacities(self, joint_list, n_boxes: int,
                        context: str = "") -> Tuple[int, int]:
        """Pick the (max_peaks, max_people) tier for one image: the base
        capacities, or — when the image's crowd overflows either and an
        escalated tier is configured — BOTH escalated together (one extra
        compiled PRN graph variant total, warmed by precompile).  The
        reference's PRN stage is unbounded (tester.py:338-350, 400-406)."""
        maxp = self.cfg.peaks.max_peaks_per_joint
        maxb = self.cfg.prn.max_people
        esc_p = self.cfg.peaks.escalate_max_peaks
        esc_b = self.cfg.prn.escalate_max_people
        counts = [0] * NUM_J17
        for row in joint_list:
            counts[int(row[4])] += 1
        need_p = max(counts)
        if ((need_p > maxp and esc_p > maxp)
                or (n_boxes > maxb and esc_b > maxb)):
            logger.info(
                "%s: crowd overflow (%d peaks/joint, %d boxes) — escalating "
                "PRN capacity to (%d peaks, %d people)",
                context, need_p, n_boxes, max(maxp, esc_p), max(maxb, esc_b))
            return max(maxp, esc_p), max(maxb, esc_b)
        return maxp, maxb

    def prn_process(self, joint_list: List[List[float]],
                    boxes_xyxy: List[Sequence[float]], file_name: str = "",
                    image_id: int = 0) -> List[Dict]:
        """PRN grouping for one image (reference tester.py:333-513)."""
        boxes = np.asarray(
            [[b[0], b[1], b[2] - b[0], b[3] - b[1]] for b in boxes_xyxy],
            np.float32).reshape(-1, 4)
        if len(boxes) == 0:
            # NOTE: empty joint_list does NOT early-return — the reference's
            # `len(peaks) == 0` guard (tester.py:359) is dead code (peaks is
            # always a list of 17 type-buckets), so with boxes but no peaks
            # it falls through to the fallback branch and emits one all-v=0
            # result per box; we reproduce that
            return []

        context = file_name or f"image {image_id}"
        maxp, maxb = self._prn_capacities(joint_list, len(boxes), context)
        nb = min(len(boxes), maxb)
        if len(boxes) > maxb:
            # the reference runs PRN per person, unbounded (tester.py:400-406)
            logger.warning(
                "%s: %d person boxes exceed the PRN person capacity %d; the "
                "%d lowest-ranked are dropped — raise cfg.prn.max_people / "
                "escalate_max_people to group this crowd fully",
                context, len(boxes), maxb, len(boxes) - maxb)
        boxes_pad = np.zeros((maxb, 4), np.float32)
        boxes_pad[:nb] = boxes[:nb]
        box_valid = np.zeros(maxb, bool)
        box_valid[:nb] = True

        peak_xy, peak_score, peak_valid = _joints_to_peak_arrays(
            joint_list, maxp, context=context)

        args = (self.params, jnp.asarray(peak_xy), jnp.asarray(peak_score),
                jnp.asarray(peak_valid), jnp.asarray(boxes_pad),
                jnp.asarray(box_valid))

        if self.cfg.prn.device_grouping:
            from multiposenet_tpu.eval.grouping import format_assignment
            # PRN + grouping fused into one dispatch, fetched in one call
            # (separate dispatches/fetches each cost a tunnel round-trip)
            a = self.prn_assign_pipeline()(*args)
            chosen, active, fallback_xy = jax.device_get(
                (a.chosen, a.active, a.fallback_xy))
            # active_any must consider only the real (non-padded) boxes
            active = active[:nb]
            return format_assignment(
                chosen[:nb], active.any(axis=(0, 2)), active,
                fallback_xy[:nb], peak_xy, boxes[:nb],
                file_name=file_name, image_id=image_id)

        table, inside, prn_out, x0, y0 = jax.device_get(
            self.prn_pipeline()(*args))
        return group_peaks(
            table[:nb], inside[:nb], x0[:nb], y0[:nb], prn_out[:nb],
            peak_xy, peak_valid, boxes[:nb],
            file_name=file_name, image_id=image_id)

    # ------------------------------------------------------------------
    # single-scale demo path (reference tester.py:195-254)
    # ------------------------------------------------------------------

    def run_image(self, img_bgr: np.ndarray, file_name: str = "",
                  image_id: int = 0) -> Tuple[List[Dict], np.ndarray]:
        cfg = self.cfg
        inp = cfg.eval.inp_size
        shape_dst = int(np.max(img_bgr.shape[:2]))
        scale = float(shape_dst) / inp
        pad = np.abs(img_bgr.shape[1] - img_bgr.shape[0])
        sq = np.pad(img_bgr, ([0, pad], [0, pad], [0, 0]),
                    "constant")[:shape_dst, :shape_dst]
        resized = cv2.resize(sq, (inp, inp))

        out = self.pipeline((inp, inp))(
            self.params, jnp.asarray(resized[None, :, :, ::-1]))

        heatmaps = np.asarray(out.heatmaps)[0]

        # peaks from the device pipeline are at input resolution (factor 4)
        joint_list = peak_arrays_to_joint_list(
            np.asarray(out.peaks.coords)[0], np.asarray(out.peaks.scores)[0],
            np.asarray(out.peaks.valid)[0], scale)
        joints = drop_neck(np.asarray(joint_list))

        # detections: post-NMS test threshold + person class (tester.py:233-241)
        dscores = np.asarray(out.detections.scores)[0]
        dboxes = np.asarray(out.detections.boxes)[0]
        keep = dscores > cfg.detection.test_score_thresh
        bboxes = (dboxes[keep] * scale).tolist()

        results = self.prn_process(joints, bboxes, file_name, image_id)
        return results, heatmaps

    def test(self, testdata_dir: Optional[str] = None,
             testresult_dir: Optional[str] = None) -> List[Dict]:
        cfg = self.cfg.eval
        testdata_dir = testdata_dir or cfg.testdata_dir
        testresult_dir = testresult_dir or cfg.testresult_dir
        all_results = []
        for name in sorted(os.listdir(testdata_dir)):
            img = cv2.imread(os.path.join(testdata_dir, name))
            if img is None:
                continue
            # uint8 end-to-end: deliberate deviation — the reference casts
            # to float32 BEFORE its pad/resize (tester.py:202-208), so its
            # resized pixels can differ from these by <=0.5 u8 LSB; staying
            # uint8 ships 4x fewer H2D bytes and fuses the normalize into
            # the first conv.  (No resize happens when the input is already
            # square at inp_size — then the two paths are bit-identical.)
            results, heatmaps = self.run_image(img, name)
            all_results.extend(results)
            if cfg.write_image:
                os.makedirs(testresult_dir, exist_ok=True)
                canvas = plot_results(img.copy(), results)
                hm = cv2.resize(np.max(heatmaps, 2), (img.shape[1], img.shape[0]))
                stem = name.split(".", 1)[0]
                cv2.imwrite(os.path.join(testresult_dir, stem + "_1heatmap.png"),
                            hm * 256)
                cv2.imwrite(os.path.join(testresult_dir, stem + "_2canvas.png"),
                            canvas)
        if cfg.write_json:
            os.makedirs(testresult_dir, exist_ok=True)
            with open(os.path.join(testresult_dir, "multipose_results.json"),
                      "w") as f:
                json.dump(all_results, f)
        return all_results

    # ------------------------------------------------------------------
    # compile-cache warmup (docs/ROADMAP.md item 4)
    # ------------------------------------------------------------------

    def eval_shapes(self, image_shapes, bucket: int = 64):
        """The exact set of padded (H, W) shapes coco_eval will dispatch for
        the given original image shapes — derived by running the same
        crop_with_factor used by _get_outputs on dummy arrays, so bucketing /
        rounding semantics can never drift."""
        shapes = set()
        for h, w in image_shapes:
            dummy = np.zeros((int(h), int(w), 3), np.uint8)
            for m in get_multipliers(int(h), self.cfg.eval.inp_size,
                                     self.cfg.eval.scale_search):
                cropped, _, _ = crop_with_factor(
                    dummy, m * int(h), factor=32, pad_val=128, bucket=bucket)
                shapes.add(cropped.shape[:2])
        return sorted(shapes)

    def precompile(self, image_shapes, bucket: int = 64) -> List[Tuple[int, int]]:
        """Warm the jit/compilation cache for every pipeline shape the
        multi-scale eval will need (cold TPU compiles are minutes each; with
        JAX_COMPILATION_CACHE_DIR set this is a one-time cost per shape set).

        `image_shapes`: iterable of original (H, W) image sizes.  Returns the
        compiled shape list.  The PRN stage is warmed too.
        """
        shapes = self.eval_shapes(image_shapes, bucket)
        nb = 2 if self.cfg.eval.flip else 1   # flip rides in the same batch
        gs = self.cfg.eval.group_size
        use_groups = self._use_groups()
        # grouped eval always dispatches full groups (partial groups are
        # padded by replication), so ONLY the gs*nb batch is ever compiled
        bs = gs * nb if use_groups else nb
        # which padded shapes are dispatched WITH detections (the scale-1.0
        # slot of some image) vs without (detect_scale1_only skips the
        # RetinaNet branch on every other scale) — a shape can need both
        det_shapes, nodet_shapes = set(), set()
        for h, w in image_shapes:
            h, w = int(h), int(w)
            ss = [crop_shape_only((h, w), m * h, factor=32, bucket=bucket)[0]
                  for m in get_multipliers(h, self.cfg.eval.inp_size,
                                           self.cfg.eval.scale_search)]
            di = det_scale_idx(len(ss))
            for si, shp in enumerate(ss):
                (det_shapes if si == di else nodet_shapes).add(shp)
        if not (self.cfg.eval.detect_scale1_only
                and self.cfg.eval.device_resize):
            # the host chain (and detect_scale1_only=False) dispatches every
            # scale with detections
            det_shapes = set(shapes)
            nodet_shapes = set()
        hm_dtype = jnp.float32
        # group mode re-dispatches a SATURATED crowd image alone through the
        # single-image path (fetch_and_finish_group), so with an escalation
        # tier configured the batch-nb forwards (and the single-image
        # pyramid below) must be warm too or that image cold-compiles
        # mid-eval
        esc_single = use_groups and self._peak_escalation_tier()
        batch_sizes = [bs] + ([nb] if esc_single else [])
        for i, hw in enumerate(shapes):
            variants = ([True] if hw in det_shapes else []) + \
                ([False] if hw in nodet_shapes else [])
            logger.info("precompile %d/%d: %dx%d (batch %s, det %s)",
                        i + 1, len(shapes), hw[0], hw[1], batch_sizes,
                        variants)
            for wb in batch_sizes:
                # uint8, matching what _get_outputs uploads (dtype is part
                # of the compile key)
                dummy = jnp.full((wb, hw[0], hw[1], 3), 128, jnp.uint8)
                for wd in variants:
                    out = self.pipeline(hw, with_peaks=False,
                                        with_detections=wd)(self.params,
                                                            dummy)
                    jax.block_until_ready(out)
                    # under --bf16 the heatmaps arrive in bfloat16; the
                    # fold warms below must match or the real eval
                    # cold-compiles
                    hm_dtype = out.heatmaps.dtype

        if self.cfg.eval.device_resize:
            pad_to = max(bucket, 1)
            pairs = set()    # (s4h, s4w, hp, wp) per scale
            combos = set()   # ((s4h, s4w), ...) x (hp, wp) per image shape
            for h, w in image_shapes:
                h, w = int(h), int(w)
                hp = -(-h // pad_to) * pad_to
                wp = -(-w // pad_to) * pad_to
                scale_shapes = []
                for m in get_multipliers(h, self.cfg.eval.inp_size,
                                         self.cfg.eval.scale_search):
                    dummy_im = np.zeros((h, w, 3), np.uint8)
                    cropped, _, _ = crop_with_factor(
                        dummy_im, m * h, factor=32, pad_val=128, bucket=bucket)
                    s4 = (cropped.shape[0] // 4, cropped.shape[1] // 4)
                    scale_shapes.append(s4)
                    pairs.add(s4 + (hp, wp))
                combos.add((tuple(scale_shapes), hp, wp))
            if self.cfg.eval.device_peaks:
                # warm the fused resize+sum+fold+peaks exec: one compile per
                # (scale-shape combo, padded bucket); the valid (h, w) is a
                # traced scalar so these cover every image in the bucket.
                # The crowd-escalation tier's variant (single-image path —
                # group escalations re-dispatch through it too) is warmed
                # alongside so a saturated crowd image never cold-compiles
                # mid-eval.
                esc = self._peak_escalation_tier()
                fuseds = ([self.accum_fold_peaks_group_fn()] if use_groups
                          else [self.accum_fold_peaks_fn()])
                if esc:
                    fuseds.append(self.accum_fold_peaks_fn(esc))
                for i, (scales, hp, wp) in enumerate(sorted(combos)):
                    logger.info("precompile fused fold %d/%d: %s->(%d,%d)",
                                i + 1, len(combos), scales, hp, wp)
                    for fi, fused in enumerate(fuseds):
                        grouped = use_groups and fi == 0
                        fbs = bs if fi == 0 else (2 if self.cfg.eval.flip
                                                  else 1)
                        hms = tuple(jnp.zeros((fbs, sh, sw, 18), hm_dtype)
                                    for sh, sw in scales)
                        if grouped:
                            mats = tuple(
                                (jnp.zeros((gs, hp, sh), jnp.float32),
                                 jnp.zeros((gs, sw, wp), jnp.float32))
                                for sh, sw in scales)
                            hh = jnp.full((gs,), hp, jnp.int32)
                            ww = jnp.full((gs,), wp, jnp.int32)
                        else:
                            mats = tuple((jnp.zeros((hp, sh), jnp.float32),
                                          jnp.zeros((sw, wp), jnp.float32))
                                         for sh, sw in scales)
                            hh, ww = jnp.int32(hp), jnp.int32(wp)
                        jax.block_until_ready(fused(
                            hms, mats, hh, ww,
                            self.cfg.eval.flip, jnp.float32(1.0)))
            else:
                # warm the per-scale resize+accumulate graphs: one per
                # unique (scale-bucket shape, padded-original shape) pair
                accum = self.accum_fn()
                for i, (s4h, s4w, hp, wp) in enumerate(sorted(pairs)):
                    logger.info("precompile resize %d/%d: (%d,%d)->(%d,%d)",
                                i + 1, len(pairs), s4h, s4w, hp, wp)
                    jax.block_until_ready(accum(
                        jnp.zeros((bs, hp, wp, 18), jnp.float32),
                        jnp.zeros((bs, s4h, s4w, 18), hm_dtype),
                        jnp.zeros((hp, s4h), jnp.float32),
                        jnp.zeros((s4w, wp), jnp.float32)))
                # the fold takes traced (h, w): one compile per bucket
                fold = self.fold_fn()
                for hp, wp in sorted({(hp, wp) for (_, _, hp, wp) in pairs}):
                    jax.block_until_ready(fold(
                        jnp.zeros((bs, hp, wp, 18), jnp.float32),
                        jnp.int32(hp), jnp.int32(wp), self.cfg.eval.flip,
                        jnp.float32(1.0)))
            if self.cfg.eval.device_image_resize:
                # warm the on-device pyramid builder: one compile per
                # (padded original bucket, scale-shape combo)
                warmed = set()
                for h, w in sorted({(int(a), int(b))
                                    for a, b in image_shapes}):
                    dests = [m * h for m in get_multipliers(
                        h, self.cfg.eval.inp_size,
                        self.cfg.eval.scale_search)]
                    hp = -(-h // pad_to) * pad_to
                    wp = -(-w // pad_to) * pad_to
                    if use_groups:
                        from multiposenet_tpu.engine import grouped_eval
                        grouped_eval.precompile_grouped_pyramid(
                            self, h, w, dests, bucket, self.cfg.eval.flip,
                            gs, hp, wp, warmed)
                        if not esc_single:
                            continue
                        # fall through: the escalation re-dispatch builds
                        # this image's pyramid through the single-image jit
                    ipack, wpack, dims, metas = self._pyramid_host_args(
                        h, w, dests, bucket, self.cfg.eval.flip)
                    # "single" tag: grouped warms share this set and their
                    # ckey has the same shape — without the tag a grouped
                    # warm would suppress the single-image warm (or vice
                    # versa) when both run (escalation under group mode)
                    ckey = ("single", (hp, wp),
                            tuple(mm[0] for mm in metas))
                    if ckey in warmed:
                        continue
                    warmed.add(ckey)
                    logger.info("precompile pyramid: (%d,%d)->%s", hp, wp,
                                ckey[2])
                    # out_shapes = the per-scale padded dims (metas[..][0]),
                    # matching the eval path's jit key exactly — passing the
                    # source (hp, wp) pair here crashed the warm the first
                    # time the escalation fall-through actually ran it
                    # (caught by the runbook dry-run's crowd scenes)
                    jax.block_until_ready(self._pyramid_fn(
                        ckey[2], self.cfg.eval.flip)(
                        jnp.zeros((hp, wp, 3), jnp.uint8),
                        ipack, wpack, dims))
        # PRN stage (single fixed shape): the fused PRN+grouping graph when
        # device grouping is on, the bare PRN pipeline otherwise.  Both
        # capacity tiers are warmed: the base (max_peaks, max_people) and —
        # when crowd escalation is configured — the escalated tier
        # prn_process switches a crowded image to
        maxb = self.cfg.prn.max_people
        maxp = self.cfg.peaks.max_peaks_per_joint
        tiers = [(maxp, maxb)]
        esc_p = self.cfg.peaks.escalate_max_peaks
        esc_b = self.cfg.prn.escalate_max_people
        if esc_p > maxp or esc_b > maxb:
            tiers.append((max(maxp, esc_p), max(maxb, esc_b)))
        for tp, tb in tiers:
            prn_args = (self.params,
                        jnp.zeros((NUM_J17, tp, 2), jnp.float32),
                        jnp.full((NUM_J17, tp), -1.0, jnp.float32),
                        jnp.zeros((NUM_J17, tp), bool),
                        jnp.zeros((tb, 4), jnp.float32),
                        jnp.zeros((tb,), bool))
            if self.cfg.prn.device_grouping:
                jax.block_until_ready(self.prn_assign_pipeline()(*prn_args))
            else:
                jax.block_until_ready(self.prn_pipeline()(*prn_args))
        return shapes

    # ------------------------------------------------------------------
    # multi-scale COCO eval (reference tester.py:131-193, 264-316)
    # ------------------------------------------------------------------

    def _get_outputs(self, multipliers: List[float], img: np.ndarray,
                     bucket: int = 64, with_flip: bool = False):
        """Multi-scale heatmap average + per-scale boxes.

        With `with_flip`, the horizontally flipped image rides in the same
        device batch as the original (one pipeline dispatch per scale
        instead of the reference's two full passes, tester.py:147-152);
        returns (heat_avg, bbox_all, flip_heat_avg_or_None, peaks_or_None).
        With device peaks (device_resize + device_peaks), heat_avg is None
        and `peaks` carries (coords, scores, valid) numpy arrays in
        original-image coordinates.
        """
        if self.cfg.eval.device_resize:
            return self._get_outputs_device(multipliers, img, bucket,
                                            with_flip)
        heat_avg = np.zeros((img.shape[0], img.shape[1], 18), np.float32)
        flip_avg = np.zeros_like(heat_avg) if with_flip else None
        bbox_all = []
        img_f = img[:, ::-1, :] if with_flip else None

        # phase 1: dispatch EVERY scale (jax dispatch is async — the device
        # computes scale s while the host crops/pads scale s+1).  Heatmaps
        # are averaged and peak-hunted on host (variable res), so the device
        # peak finder is skipped per scale.
        pending = []
        for m in multipliers:
            inp_size = m * img.shape[0]
            cropped, im_scale, real_shape = crop_with_factor(
                img, inp_size, factor=32, pad_val=128, bucket=bucket)
            batch = [cropped[:, :, ::-1]]
            if with_flip:
                cropped_f, _, _ = crop_with_factor(
                    img_f, inp_size, factor=32, pad_val=128, bucket=bucket)
                batch.append(cropped_f[:, :, ::-1])
            out = self.pipeline(cropped.shape[:2], with_peaks=False)(
                self.params, jnp.asarray(np.stack(batch)))
            pending.append((out, cropped.shape, real_shape, im_scale))

        # phase 2: one batched fetch, then host-side resize/average
        fetched = jax.device_get(
            [(o.heatmaps, o.detections.scores, o.detections.boxes)
             for o, *_ in pending])
        for (hms, dscores, dboxes), (_, cropped_shape, real_shape, im_scale) \
                in zip(fetched, pending):
            heat_avg += resize_heatmap_to_original(
                hms[0], cropped_shape, real_shape,
                img.shape) / len(multipliers)
            if with_flip:
                flip_avg += resize_heatmap_to_original(
                    hms[1], cropped_shape, real_shape,
                    img.shape) / len(multipliers)
            keep = dscores[0] > self.cfg.detection.test_score_thresh
            bbox_all.append((dboxes[0][keep] / im_scale).tolist())
        return heat_avg, bbox_all, flip_avg, None

    def _dispatch_image_device(self, multipliers: List[float],
                               img: np.ndarray, bucket: int = 64,
                               with_flip: bool = False,
                               max_peaks: Optional[int] = None):
        """Enqueue ALL of one image's device work (async, no fetch): the
        per-scale pipeline forwards, then — with device peaks — ONE fused
        resize+sum+fold+peaks exec (`accum_fold_peaks_fn`); without, the
        per-scale accum chain + fold.  The stride-4 heatmaps never reach
        the host.  Returns an opaque handle for `_fetch_image_device`.
        `max_peaks` selects the escalated peak-capacity tier (crowd
        re-dispatch, `_fetch_finish_escalating`)."""
        h, w = img.shape[:2]
        pad_to = max(bucket, 1)
        hp = -(-h // pad_to) * pad_to
        wp = -(-w // pad_to) * pad_to
        nb = 2 if with_flip else 1
        img_f = img[:, ::-1, :] if with_flip else None

        use_fused = self.cfg.eval.device_peaks
        use_pyr = self.cfg.eval.device_image_resize
        hms, mats = [], []
        avg = None if use_fused else jnp.zeros((nb, hp, wp, 18), jnp.float32)
        accum = None if use_fused else self.accum_fn()
        det_pending = []

        if use_pyr:
            # ONE ~1 MB upload (padded original, RGB) + ~50 KB of packed
            # resize coefficients; the whole scale pyramid (and its flip
            # rows) is built on device in one exec
            dests = [m * img.shape[0] for m in multipliers]
            ipack, wpack, dims, metas = self._pyramid_host_args(
                h, w, dests, bucket, with_flip)
            src = np.zeros((hp, wp, 3), np.uint8)
            src[:h, :w] = img[:, :, ::-1]
            batches = self._pyramid_fn(
                tuple(mm[0] for mm in metas), with_flip)(
                jnp.asarray(src), ipack, wpack, dims)
            scales = [(mm[0], batch, mm[1], mm[2])
                      for mm, batch in zip(metas, batches)]
        else:
            scales = []
            for m in multipliers:
                inp_size = m * img.shape[0]
                cropped, im_scale, real_shape = crop_with_factor(
                    img, inp_size, factor=32, pad_val=128, bucket=bucket)
                batch = [cropped[:, :, ::-1]]
                if with_flip:
                    cropped_f, _, _ = crop_with_factor(
                        img_f, inp_size, factor=32, pad_val=128,
                        bucket=bucket)
                    batch.append(cropped_f[:, :, ::-1])
                scales.append((cropped.shape[:2],
                               jnp.asarray(np.stack(batch)),
                               real_shape[:2], im_scale))

        det_idx = det_scale_idx(len(scales))
        for s, (hw2, batch, real_shape, im_scale) in enumerate(scales):
            wd = (s == det_idx) or not self.cfg.eval.detect_scale1_only
            out = self.pipeline(hw2, with_peaks=False, with_detections=wd)(
                self.params, batch)
            rm = self._resize_mats_dev(
                hw2[0] // 4, hw2[1] // 4, real_shape[0], real_shape[1],
                h, w, hp, wp)
            if use_fused:
                hms.append(out.heatmaps)
                mats.append(rm)
            else:
                avg = accum(avg, out.heatmaps, rm[0], rm[1])
            det_pending.append((out.detections if wd else None, im_scale))

        inv_n = jnp.float32(1.0 / len(multipliers))
        if use_fused:
            fused = (self.accum_fold_peaks_fn() if max_peaks is None
                     else self.accum_fold_peaks_fn(max_peaks))
            pk = fused(
                tuple(hms), tuple(mats), jnp.int32(h), jnp.int32(w),
                with_flip, inv_n)
            return ("peaks", pk, det_pending, (h, w))
        heat = self.fold_fn()(avg, jnp.int32(h), jnp.int32(w), with_flip,
                              inv_n)
        return ("heat", heat, det_pending, (h, w))

    def _fetch_image_device(self, handle):
        """One batched device_get for everything `_dispatch_image_device`
        enqueued; returns the `_get_outputs` 4-tuple.  Scales whose
        detection branch was skipped (detect_scale1_only) contribute an
        empty box list — _finish_image only reads the scale-1.0 entry."""
        kind, obj, det_pending, (h, w) = handle
        det_items = [(d.scores, d.boxes) for d, _ in det_pending
                     if d is not None]
        if kind == "peaks":
            fetched = jax.device_get(
                [(obj.coords, obj.scores, obj.valid)] + det_items)
            peaks = tuple(np.asarray(a) for a in fetched[0])
            heat_avg = None
        else:
            # flip_heat is returned as None so _finish_image knows the flip
            # is already folded in; the padded map is cropped to the
            # original resolution here on host
            fetched = jax.device_get([obj] + det_items)
            heat_avg = np.asarray(fetched[0], np.float32)[:h, :w]
            peaks = None
        bbox_all = []
        it = iter(fetched[1:])
        for d, im_scale in det_pending:
            if d is None:
                bbox_all.append([])
                continue
            dscores, dboxes = next(it)
            keep = dscores[0] > self.cfg.detection.test_score_thresh
            bbox_all.append((dboxes[0][keep] / im_scale).tolist())
        return heat_avg, bbox_all, None, peaks

    def _get_outputs_device(self, multipliers: List[float], img: np.ndarray,
                            bucket: int = 64, with_flip: bool = False):
        return self._fetch_image_device(self._dispatch_image_device(
            multipliers, img, bucket=bucket, with_flip=with_flip))

    def _peak_escalation_tier(self) -> int:
        """Escalated per-joint peak capacity, or 0 when escalation is off
        (disabled, non-device-peaks path, or tier not above base)."""
        esc = self.cfg.peaks.escalate_max_peaks
        if (self.cfg.eval.device_peaks and self.cfg.eval.device_resize
                and esc > self.cfg.peaks.max_peaks_per_joint):
            return esc
        return 0

    def _fetch_finish_escalating(self, handle, img, multipliers, bucket,
                                 img_h, name, img_id) -> List[Dict]:
        """Fetch one dispatched image and finish it — re-dispatching the
        whole image at the escalated peak capacity first if the base-tier
        device top-k SATURATED (some joint type filled every slot, so peaks
        may have been truncated).  The reference's host peak lists are
        unbounded (tester.py:338-350); with a configured escalation tier a
        base-capacity truncation can never reach the protocol output."""
        heat, bbox, flip, peaks = self._fetch_image_device(handle)
        esc = self._peak_escalation_tier()
        if (peaks is not None and esc
                and bool(np.asarray(peaks[2]).all(axis=-1).any())):
            logger.info(
                "%s: peak capacity %d saturated — re-dispatching at the "
                "escalated tier %d", name or f"image {img_id}",
                self.cfg.peaks.max_peaks_per_joint, esc)
            handle = self._dispatch_image_device(
                multipliers, img, bucket=bucket,
                with_flip=self.cfg.eval.flip, max_peaks=esc)
            heat, bbox, flip, peaks = self._fetch_image_device(handle)
        return self._finish_image(heat, flip, bbox, img_h, name, img_id,
                                  peaks)

    # ------------------------------------------------------------------
    # grouped multi-image dispatch (eval.group_size > 1)
    # ------------------------------------------------------------------

    def _use_groups(self) -> bool:
        """EXPERIMENTAL grouped dispatch gate — see engine/grouped_eval.py
        (measured slower than the pipelined per-image path on v5e,
        docs/PERF.md; quarantined, default off)."""
        from multiposenet_tpu.engine import grouped_eval
        return grouped_eval.use_groups(self)

    def _group_signature(self, h: int, w: int, bucket: int):
        from multiposenet_tpu.engine import grouped_eval
        return grouped_eval.group_signature(self, h, w, bucket)

    def _dispatch_group_device(self, imgs: List[np.ndarray], bucket: int,
                               with_flip: bool):
        from multiposenet_tpu.engine import grouped_eval
        return grouped_eval.dispatch_group_device(self, imgs, bucket,
                                                  with_flip)

    def _fetch_group_device(self, handle):
        from multiposenet_tpu.engine import grouped_eval
        return grouped_eval.fetch_group_device(self, handle)

    def _finish_image(self, orig_heat, flip_heat, orig_bbox, img_h,
                      name, img_id, peaks=None) -> List[Dict]:
        """Host post-processing for one image (reference tester.py:151-177):
        flip averaging, peak finding, PRN grouping, COCO reorder.  With
        `peaks` (device-peaks path) the heatmap never reached the host and
        the joint list comes straight from the device peak arrays."""
        cfg = self.cfg
        if peaks is not None:
            jl = np.asarray(peak_arrays_to_joint_list(*peaks)).reshape(-1, 5)
        else:
            if cfg.eval.flip and flip_heat is not None:
                heat = average_flip_heat(orig_heat, flip_heat)
            else:
                # flip_heat None with flip on = the device path already
                # folded the mirror map in (fold_fn)
                heat = orig_heat
            jl = joint_list_from_heatmaps(heat[:, :, :18], img_h, 1.0,
                                          cfg.peaks.thre1,
                                          refine=cfg.peaks.refine)
        joints = drop_neck(jl)
        # detections from scale 1.0 only (reference tester.py:169)
        scale1 = det_scale_idx(len(orig_bbox))
        prn_res = self.prn_process(joints, orig_bbox[scale1], name, img_id)
        out = []
        for r in prn_res:
            r["keypoints"] = to_coco_order(r["keypoints"])
            r.pop("file_name", None)
            out.append(r)
        return out

    def coco_eval(self, coco_root: Optional[str] = None,
                  ann_file: Optional[str] = None, img_dir: Optional[str] = None,
                  max_images: Optional[int] = None,
                  result_file: Optional[str] = None,
                  bucket: int = 64,
                  shard: Tuple[int, int] = (0, 1),
                  skip_metrics: bool = False) -> Dict[str, float]:
        cfg = self.cfg
        coco_root = coco_root or cfg.data.coco_root
        ann_file = ann_file or os.path.join(
            coco_root, "annotations/person_keypoints_val2017.json")
        img_dir = img_dir or os.path.join(coco_root, "images/val2017")

        gt = COCOIndex(ann_file)
        img_ids = gt.get_img_ids(cat_ids=[1])
        if max_images:
            img_ids = img_ids[:max_images]
        from multiposenet_tpu.parallel import distributed as dist
        # multi-host cluster with no explicit shard: each process takes a
        # strided shard automatically; results are all-gathered over the
        # cluster's own collectives (no shared filesystem needed) and the
        # primary scores the merged set — one command on every host
        # replaces the manual --eval-shard + merge-results dance
        auto_dist = shard == (0, 1) and dist.process_count() > 1
        if auto_dist:
            shard = (dist.process_index(), dist.process_count())
        full_img_ids = list(img_ids)
        if shard != (0, 1):
            # embarrassingly parallel eval: worker i of n takes a strided
            # slice; manual shards merge with `cli merge-results`
            img_ids = img_ids[shard[0]::shard[1]]
            logger.info("eval shard %d/%d: %d images%s", shard[0], shard[1],
                        len(img_ids),
                        " (distributed auto-shard)" if auto_dist else "")

        # pipeline images: the main thread only reads/preps/dispatches; a
        # background worker does EVERYTHING blocking for unit n — the
        # batched device fetch, peak bookkeeping, PRN grouping — while unit
        # n+1's device dispatches are already enqueued, so neither the
        # device nor the fetch round-trip ever idles the dispatch loop.
        # Depth is bounded so at most ~3 units' device buffers are alive.
        gs = cfg.eval.group_size
        use_groups = self._use_groups()
        if use_groups:
            # sort by the json-recorded size so same-signature images
            # arrive together (groups are still keyed on ACTUAL loaded
            # sizes — a wrong json record only costs a padded flush)
            recs = {r["id"]: r for r in gt.load_imgs(img_ids)}
            img_ids = sorted(img_ids, key=lambda i: (
                int(recs[i].get("height", 0)), int(recs[i].get("width", 0))))

        results = []
        futures = []
        eval_error: Optional[BaseException] = None
        pending: Dict[Tuple, List] = {}  # sig -> [(img, h, name, id), ...]
        try:
            self._coco_eval_loop(cfg, gt, img_ids, img_dir, bucket, gs,
                                 use_groups, results, futures, pending)
        except BaseException as e:
            if not auto_dist:
                raise
            # a dead shard must STILL join the collective gather below or
            # every healthy host hangs in process_allgather forever; the
            # real error re-raises right after
            eval_error = e
            logger.exception("eval shard %d/%d failed; joining the result "
                             "gather before re-raising", *shard)

        if auto_dist:
            payload = {"results": results,
                       "error": repr(eval_error) if eval_error else None}
            gathered = dist.gather_objects(payload,
                                           decode=dist.is_primary())
            if eval_error is not None:
                raise eval_error
            if not dist.is_primary():
                return {}
            errs = [p["error"] for p in gathered if p["error"]]
            if errs:
                raise RuntimeError(
                    f"{len(errs)} eval shard(s) failed: {errs}; refusing "
                    "to score partial results")
            results = [r for p in gathered for r in p["results"]]
            img_ids = full_img_ids

        if result_file:
            with open(result_file, "w") as f:
                json.dump(results, f, indent=4)

        if skip_metrics:
            logger.info("shard done: %d results (metrics skipped; merge "
                        "shards first)", len(results))
            return {}
        if not results:
            logger.warning("coco_eval produced no detections")
            return {}
        dt = gt.load_res(results)
        ev = KeypointEval(gt, dt, img_ids=img_ids)
        metrics = ev.evaluate()
        print(ev.summarize())
        return metrics

    def _coco_eval_loop(self, cfg, gt, img_ids, img_dir, bucket, gs,
                        use_groups, results, futures, pending):
        """The dispatch/fetch pipeline over one shard's images, appending
        finished person results to `results` (factored out so coco_eval
        can keep collective-gather participation on failure)."""
        from concurrent.futures import ThreadPoolExecutor

        def fetch_and_finish(handle, img, mult, img_h, name, img_id):
            return self._fetch_finish_escalating(handle, img, mult, bucket,
                                                 img_h, name, img_id)

        def fetch_and_finish_group(handle, metas):
            # metas covers the REAL images only; padded replica rows at the
            # tail of the group are dropped
            outs = self._fetch_group_device(handle)
            esc = self._peak_escalation_tier()
            res = []
            for (heat, bbox, flip, peaks), (img, img_h, name, img_id) in zip(
                    outs, metas):
                if (peaks is not None and esc
                        and bool(np.asarray(peaks[2]).all(axis=-1).any())):
                    # saturated crowd image: re-dispatch it alone at the
                    # escalated tier through the single-image path
                    logger.info(
                        "%s: peak capacity saturated in group — "
                        "re-dispatching at tier %d", name, esc)
                    mult = get_multipliers(img_h, cfg.eval.inp_size,
                                           cfg.eval.scale_search)
                    h2 = self._dispatch_image_device(
                        mult, img, bucket=bucket, with_flip=cfg.eval.flip,
                        max_peaks=esc)
                    heat, bbox, flip, peaks = self._fetch_image_device(h2)
                res.extend(self._finish_image(heat, flip, bbox, img_h,
                                              name, img_id, peaks))
            return res

        with ThreadPoolExecutor(max_workers=1) as pool:

            def flush(sig):
                group = pending.pop(sig)
                imgs = [g[0] for g in group]
                while len(imgs) < gs:
                    # replicate the last image so only ONE group batch size
                    # is ever compiled; replica results are dropped
                    imgs.append(imgs[-1])
                handle = self._dispatch_group_device(
                    imgs, bucket=bucket, with_flip=cfg.eval.flip)
                futures.append(pool.submit(
                    fetch_and_finish_group, handle,
                    [(g[0], g[1], g[2], g[3]) for g in group]))

            for n, img_id in enumerate(img_ids):
                name = gt.load_imgs(img_id)[0]["file_name"]
                # keep uint8: the reference resizes the u8 image per scale
                # and normalizes on the cropped result (tester.py:285-291)
                ori = cv2.imread(os.path.join(img_dir, name))
                if use_groups:
                    sig = self._group_signature(ori.shape[0], ori.shape[1],
                                                bucket)
                    # sorted arrival means any OTHER pending signature will
                    # never fill — flush it (padded) to bound host memory
                    for other in [s for s in pending if s != sig]:
                        flush(other)
                    pending.setdefault(sig, []).append(
                        (ori, ori.shape[0], name, img_id))
                    if len(pending[sig]) == gs:
                        flush(sig)
                else:
                    mult = get_multipliers(ori.shape[0], cfg.eval.inp_size,
                                           cfg.eval.scale_search)
                    if cfg.eval.device_resize:
                        handle = self._dispatch_image_device(
                            mult, ori, bucket=bucket,
                            with_flip=cfg.eval.flip)
                        futures.append(pool.submit(
                            fetch_and_finish, handle, ori, mult,
                            ori.shape[0], name, img_id))
                    else:
                        orig_heat, orig_bbox, flip_heat, peaks = \
                            self._get_outputs(mult, ori, bucket=bucket,
                                              with_flip=cfg.eval.flip)
                        futures.append(pool.submit(
                            self._finish_image, orig_heat, flip_heat,
                            orig_bbox, ori.shape[0], name, img_id, peaks))
                while len(futures) > 2:
                    results.extend(futures.pop(0).result())
                if (n + 1) % 50 == 0:
                    logger.info("coco_eval %d/%d images", n + 1, len(img_ids))
            for sig in list(pending):
                flush(sig)
            for f in futures:
                results.extend(f.result())
