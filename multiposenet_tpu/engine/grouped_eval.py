"""EXPERIMENTAL: grouped multi-image eval dispatch (``eval.group_size > 1``).

Batches G same-signature images through one pyramid exec, one forward per
scale at batch G*nb, and one vmapped fused resize+sum+fold+peaks exec, so
each exec's fixed per-dispatch overhead amortizes over the group.

Status: **measured SLOWER on v5e at every tested config** — 9-15% below the
per-image pipelined path (docs/PERF.md "Grouped dispatch"), because the
per-exec overhead it amortizes is already hidden by the dispatch/fetch
pipelining, while grouping serializes same-signature arrivals and pads
partial groups with replicated work.  It is kept, quarantined here, for
runtimes whose per-exec overhead is NOT hidden by pipelining (very high
round-trip-latency remote executors); on TPU leave ``group_size=1``.

Numerics are identical to G single-image dispatches — batch rows are
independent through every stage (tests/test_integration.py::
test_coco_eval_grouped_matches_ungrouped).

Every function takes the `Evaluator` instance first; caches live on the
evaluator's ``__dict__`` via its bounded ``_lru`` so HBM budgets are shared
with the per-image path.  Reference analog: none — the reference evaluates
strictly per image (evaluate/tester.py:131-193).
"""

from __future__ import annotations

import functools
from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from multiposenet_tpu.eval.multiscale import crop_shape_only, get_multipliers
from multiposenet_tpu.utils.logging import logger


def use_groups(ev) -> bool:
    """Single source of truth for grouped-dispatch gating — precompile and
    coco_eval MUST agree or eval cold-compiles a batch size the warmup never
    saw.  Grouping needs the full device path; warn when group_size>1 is
    being silently dropped by a host-* flag."""
    e = ev.cfg.eval
    on = (e.group_size > 1 and e.device_resize and e.device_peaks
          and e.device_image_resize)
    if e.group_size > 1 and not on:
        logger.warning(
            "group_size=%d ignored: grouped dispatch needs the full "
            "device path (device_resize/device_peaks/"
            "device_image_resize); falling back to per-image "
            "dispatches — a grouped precompile does NOT cover these",
            e.group_size)
    return on


def group_signature(ev, h: int, w: int, bucket: int):
    """Scale-shape signature of an image: images with equal signatures share
    every compiled shape in the device eval path and can ride one batched
    dispatch (`dispatch_group_device`)."""
    pad_to = max(bucket, 1)
    shapes = tuple(
        crop_shape_only((h, w), m * h, factor=32, bucket=bucket)[0]
        for m in get_multipliers(h, ev.cfg.eval.inp_size,
                                 ev.cfg.eval.scale_search))
    return shapes + ((-(-h // pad_to) * pad_to,
                      -(-w // pad_to) * pad_to),)


def accum_fold_peaks_group_fn(ev):
    """Group variant of `Evaluator.accum_fold_peaks_fn`: the body vmapped
    over G images that share one scale-shape signature.  `hms` arrive
    exactly as the batched forwards produce them — (G*nb, s4h, s4w, 18) per
    scale — and are reshaped to (G, nb, ...) inside the jit (a free
    leading-dim view) so no extra device dispatch is spent splitting the
    group."""
    if getattr(ev, "_accum_fold_peaks_group_jit", None) is None:
        body = ev._fused_fold_peaks_body()

        @functools.partial(jax.jit, static_argnums=(4,))
        def run(hms, mats, h, w, with_flip, inv_n):
            g = h.shape[0]
            hms = tuple(hm.reshape((g, -1) + hm.shape[1:]) for hm in hms)
            return jax.vmap(
                lambda hm, mt, hh, ww: body(hm, mt, hh, ww, with_flip,
                                            inv_n))(hms, mats, h, w)
        ev._accum_fold_peaks_group_jit = run
    return ev._accum_fold_peaks_group_jit


def pyramid_group_fn(ev, out_shapes, with_flip: bool):
    """Group variant of `Evaluator._pyramid_fn`: vmapped over G
    same-signature images, each with its own coefficient packs, then
    flattened to the (G*nb, dh, dw, 3) batches the grouped forwards consume
    — all in one exec."""
    jits = ev.__dict__.setdefault("_pyramid_jits", {})
    key = (tuple(out_shapes), bool(with_flip), "group")
    if key not in jits:
        body = ev._pyramid_body(out_shapes, with_flip)

        def run(srcs, ipacks, wpacks, dims):
            outs = jax.vmap(body)(srcs, ipacks, wpacks, dims)
            return tuple(o.reshape((-1,) + o.shape[2:]) for o in outs)
        jits[key] = jax.jit(run)
    return jits[key]


def pyramid_group_args(ev, sizes, dests_list, bucket: int, with_flip: bool):
    """Stacked (G, ...) device-resident coefficient buffers + per-image
    metas for a same-signature group, LRU-cached per group composition
    (after signature sorting most groups are uniform-size, so this hits one
    entry per common image size)."""
    keys, packs = zip(*[ev._pyramid_args_np(h, w, dests, bucket, with_flip)
                        for (h, w), dests in zip(sizes, dests_list)])
    metas = [p[3] for p in packs]
    return ev._lru("_pyramid_group_cache", tuple(keys), lambda: (
        jnp.asarray(np.stack([p[0] for p in packs])),
        jnp.asarray(np.stack([p[1] for p in packs])),
        jnp.asarray(np.stack([p[2] for p in packs]))),
        maxn=max(1, ev._DEV_CACHE_MAX // len(keys))) + (metas,)


def resize_mats_group_dev(ev, keys):
    """Stacked (G, hp, s4h)/(G, s4w, wp) device-resident resize matrices for
    one scale of a group, LRU-cached per group composition (bound scaled
    down by G — entries are G-stacked)."""
    def make():
        mats = [ev._resize_mats_np(k) for k in keys]
        return (jnp.asarray(np.stack([m[0] for m in mats])),
                jnp.asarray(np.stack([m[1] for m in mats])))
    return ev._lru("_resize_mat_group_cache", tuple(keys), make,
                   maxn=max(1, ev._DEV_CACHE_MAX // len(keys)))


def dispatch_group_device(ev, imgs: List[np.ndarray], bucket: int,
                          with_flip: bool):
    """Enqueue ALL device work for a GROUP of images sharing one scale-shape
    signature: ONE batched pyramid exec, one forward per scale at batch G*nb
    — so each forward's fixed per-exec overhead (~45 ms of parameter-copy
    spans on this runtime, docs/PERF.md) amortizes over the whole group —
    and ONE vmapped fused resize+sum+fold+peaks exec.  Requires the full
    device path (device_resize + device_peaks + device_image_resize).
    Returns an opaque handle for `fetch_group_device`."""
    from multiposenet_tpu.engine.evaluator import det_scale_idx

    G = len(imgs)
    nb = 2 if with_flip else 1
    sizes = [img.shape[:2] for img in imgs]
    sig = group_signature(ev, *sizes[0], bucket)
    assert all(group_signature(ev, h, w, bucket) == sig
               for h, w in sizes[1:]), "group signature mismatch"
    hp, wp = sig[-1]
    dests_list = [[m * h for m in get_multipliers(
        h, ev.cfg.eval.inp_size, ev.cfg.eval.scale_search)]
        for h, _ in sizes]
    ipacks, wpacks, dimss, metas = pyramid_group_args(
        ev, sizes, dests_list, bucket, with_flip)

    srcs = np.zeros((G, hp, wp, 3), np.uint8)
    for g, img in enumerate(imgs):
        srcs[g, :img.shape[0], :img.shape[1]] = img[:, :, ::-1]
    shapes = tuple(mm[0] for mm in metas[0])
    batches = pyramid_group_fn(ev, shapes, with_flip)(
        jnp.asarray(srcs), ipacks, wpacks, dimss)

    hms, mats, det_pending = [], [], []
    det_idx = det_scale_idx(len(shapes))
    for s, ((dh, dw), batch) in enumerate(zip(shapes, batches)):
        wd = (s == det_idx) or not ev.cfg.eval.detect_scale1_only
        out = ev.pipeline((dh, dw), with_peaks=False,
                          with_detections=wd)(ev.params, batch)
        hms.append(out.heatmaps)
        mats.append(resize_mats_group_dev(ev, tuple(
            (dh // 4, dw // 4, metas[g][s][1][0], metas[g][s][1][1],
             sizes[g][0], sizes[g][1], hp, wp) for g in range(G))))
        det_pending.append(
            (out.detections if wd else None,
             [metas[g][s][2] for g in range(G)]))

    inv_n = jnp.float32(1.0 / len(shapes))
    hvec = jnp.asarray([h for h, _ in sizes], jnp.int32)
    wvec = jnp.asarray([w for _, w in sizes], jnp.int32)
    pk = accum_fold_peaks_group_fn(ev)(
        tuple(hms), tuple(mats), hvec, wvec, with_flip, inv_n)
    return (pk, det_pending, sizes, nb)


def fetch_group_device(ev, handle):
    """One batched device_get for everything `dispatch_group_device`
    enqueued; returns a list of per-image `_get_outputs` 4-tuples.
    Detection-skipped scales (detect_scale1_only) yield empty box lists,
    matching `Evaluator._fetch_image_device`."""
    pk, det_pending, sizes, nb = handle
    det_items = [(d.scores, d.boxes) for d, _ in det_pending
                 if d is not None]
    fetched = jax.device_get(
        [(pk.coords, pk.scores, pk.valid)] + det_items)
    coords, scores, valid = fetched[0]
    outs = []
    for g in range(len(sizes)):
        bbox_all = []
        it = iter(fetched[1:])
        for d, im_scales in det_pending:
            if d is None:
                bbox_all.append([])
                continue
            dscores, dboxes = next(it)
            keep = dscores[g * nb] > ev.cfg.detection.test_score_thresh
            bbox_all.append(
                (dboxes[g * nb][keep] / im_scales[g]).tolist())
        peaks = (np.asarray(coords[g]), np.asarray(scores[g]),
                 np.asarray(valid[g]))
        outs.append((None, bbox_all, None, peaks))
    return outs


def precompile_grouped_pyramid(ev, h: int, w: int, dests, bucket: int,
                               with_flip: bool, gs: int, hp: int, wp: int,
                               warmed: set) -> None:
    """Warm the grouped on-device pyramid builder for one image size: one
    compile per (padded original bucket, scale-shape combo) at group width
    G (the per-image precompile loop calls this when grouping is on)."""
    ipacks, wpacks, dimss, metas = pyramid_group_args(
        ev, [(h, w)] * gs, [dests] * gs, bucket, with_flip)
    ckey = ((hp, wp), tuple(mm[0] for mm in metas[0]))
    if ckey in warmed:
        return
    warmed.add(ckey)
    logger.info("precompile pyramid: (%d,%d)->%s x%d", hp, wp, ckey[1], gs)
    jax.block_until_ready(pyramid_group_fn(ev, ckey[1], with_flip)(
        jnp.zeros((gs, hp, wp, 3), jnp.uint8), ipacks, wpacks, dimss))
