"""Eval-path tests: multiscale helpers, host/device peak parity, grouping."""

import numpy as np
import jax.numpy as jnp

from multiposenet_tpu.eval.multiscale import (
    SWAP_HEAT_18,
    average_flip_heat,
    crop_with_factor,
    find_peaks_np,
    get_multipliers,
    joint_list_from_heatmaps,
)
from multiposenet_tpu.engine.evaluator import drop_neck, _joints_to_peak_arrays
from multiposenet_tpu.ops.peaks import find_peaks_refined


def test_get_multipliers():
    m = get_multipliers(240, 480)
    np.testing.assert_allclose(m, [1.0, 2.0, 3.0, 4.0, 5.0])


def test_crop_with_factor_shapes():
    img = np.zeros((100, 160, 3), np.uint8)
    padded, scale, real = crop_with_factor(img, 240, factor=32, pad_val=128)
    # min dim 100 -> scale 2.4 -> (240, 384); pad to /32: (256, 384)
    assert abs(scale - 2.4) < 1e-9
    assert padded.shape == (256, 384, 3)
    assert real[:2] == (240, 384)
    assert padded[250, 0, 0] == 128  # pad value
    # bucketing bounds the shape set
    p2, _, _ = crop_with_factor(img, 240, factor=32, pad_val=128, bucket=128)
    assert p2.shape[0] % 128 == 0 and p2.shape[1] % 128 == 0


def test_average_flip_heat_identity_for_symmetric():
    # a symmetric heatmap with swapped channels must equal its own average
    h, w = 8, 8
    heat = np.random.RandomState(0).rand(h, w, 18).astype(np.float32)
    flipped = heat[:, ::-1, :][:, :, SWAP_HEAT_18]
    avg = average_flip_heat(heat, flipped)
    np.testing.assert_allclose(avg, heat, atol=1e-6)
    perm = np.array(SWAP_HEAT_18)
    np.testing.assert_array_equal(perm[perm], np.arange(18))


def test_host_and_device_peaks_agree_interior():
    """find_peaks_np == ops.find_peaks_refined for interior peaks."""
    rng = np.random.RandomState(3)
    hm = np.zeros((40, 48, 3), np.float32)
    yy, xx = np.mgrid[0:40, 0:48]
    for j, (cy, cx) in enumerate([(12.3, 20.6), (25.7, 30.2), (18.1, 9.4)]):
        hm[:, :, j] = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / 6.0) * 0.8

    host = find_peaks_np(hm, thre1=0.1, upsamp_factor=4.0)
    dev = find_peaks_refined(jnp.asarray(hm), 0.1, 8, upsamp_factor=4)
    dev_coords = np.asarray(dev.coords)
    dev_valid = np.asarray(dev.valid)
    for j in range(3):
        assert len(host[j]) == int(dev_valid[j].sum()) == 1
        np.testing.assert_array_equal(host[j][0][:2], dev_coords[j, 0])


def test_joint_list_format():
    hm = np.zeros((20, 20, 18), np.float32)
    hm[5, 5, 0] = 0.9
    hm[10, 12, 2] = 0.7
    jl = joint_list_from_heatmaps(hm, img_h=20, scale=2.0)
    assert jl.shape == (2, 5)
    # scaled coords, joint types 0 and 2
    assert jl[0][4] == 0 and jl[1][4] == 2
    np.testing.assert_allclose(jl[0][:2], [10, 10])


def test_drop_neck_reindexing():
    rows = np.array([
        [1, 2, 0.9, 0, 0],   # nose stays 0
        [3, 4, 0.8, 1, 1],   # neck dropped
        [5, 6, 0.7, 2, 2],   # -> 1
        [7, 8, 0.6, 3, 17],  # -> 16
    ])
    out = drop_neck(rows)
    assert len(out) == 3
    assert [r[4] for r in out] == [0, 1, 16]


def test_joints_to_peak_arrays_capacity_and_order():
    jl = [[1, 2, 0.9, 0, 3], [4, 5, 0.8, 1, 3], [6, 7, 0.7, 2, 0]]
    xy, score, valid = _joints_to_peak_arrays(jl, max_peaks=2)
    assert xy.shape == (17, 2, 2)
    np.testing.assert_allclose(xy[3, 0], [1, 2])
    np.testing.assert_allclose(xy[3, 1], [4, 5])
    np.testing.assert_allclose(xy[0, 0], [6, 7])
    # reference enters every peak with confidence 1
    assert score[3, 0] == 1.0 and score[3, 1] == 1.0
    assert valid.sum() == 3


# --------------------------------------------------------------- precompile

class _StubOut:
    def __init__(self, bs, h, w):
        import types
        hm = np.zeros((bs, h // 4, w // 4, 18), np.float32)
        self.heatmaps = jnp.asarray(hm)
        self.detections = types.SimpleNamespace(
            scores=jnp.zeros((bs, 10), jnp.float32),
            boxes=jnp.zeros((bs, 10, 4), jnp.float32))


def _stub_evaluator(cfg):
    import dataclasses
    from multiposenet_tpu.engine.evaluator import Evaluator
    ev = Evaluator.__new__(Evaluator)
    # host grouping / host resize: these stub tests target the dispatch
    # bookkeeping, not the device kernels
    ev.cfg = dataclasses.replace(
        cfg, prn=dataclasses.replace(cfg.prn, device_grouping=False),
        eval=dataclasses.replace(cfg.eval, device_resize=False))
    ev.params = None
    ev.called = []

    def pipeline(hw, with_peaks=True, with_detections=True):
        assert not with_peaks, "multi-scale eval must skip device peaks"
        def run(params, batch):
            ev.called.append((tuple(hw), batch.shape[0]))
            return _StubOut(batch.shape[0], hw[0], hw[1])
        return run

    ev.pipeline = pipeline
    ev.prn_pipeline = lambda: (lambda *a: jnp.zeros(()))
    return ev


def test_eval_shapes_predict_get_outputs_dispatch():
    """precompile's shape derivation must match _get_outputs exactly
    (docs/ROADMAP.md item 4): warming those shapes means the real eval
    never triggers a cold compile."""
    import dataclasses
    from multiposenet_tpu.config import Config
    cfg = Config()
    cfg = dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, inp_size=128,
                                      scale_search=(0.5, 1.0, 1.5),
                                      flip=True))
    ev = _stub_evaluator(cfg)
    img_shapes = [(160, 224), (240, 180), (128, 128)]
    predicted = set(ev.eval_shapes(img_shapes, bucket=64))

    for h, w in img_shapes:
        img = np.zeros((h, w, 3), np.float32)
        mult = get_multipliers(h, cfg.eval.inp_size, cfg.eval.scale_search)
        ev._get_outputs(mult, img, bucket=64, with_flip=True)
    dispatched = {hw for hw, _ in ev.called}
    assert dispatched == predicted, (dispatched, predicted)
    # flip rides in the same batch
    assert all(bs == 2 for _, bs in ev.called)


def test_precompile_warms_every_shape_once():
    import dataclasses
    from multiposenet_tpu.config import Config
    cfg = Config()
    cfg = dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, inp_size=128,
                                      scale_search=(0.5, 1.0), flip=False))
    ev = _stub_evaluator(cfg)
    shapes = ev.precompile([(160, 224), (160, 224), (128, 128)], bucket=64)
    assert sorted({hw for hw, _ in ev.called}) == shapes
    assert len(ev.called) == len(shapes)          # deduped
    assert all(bs == 1 for _, bs in ev.called)    # no flip -> batch 1


def test_precompile_group_mode_warms_escalation_batches():
    """Group-mode eval re-dispatches a SATURATED crowd image alone through
    the single-image path (fetch_and_finish_group), so with an escalation
    tier configured precompile must warm the per-scale forwards at BOTH
    the group batch (gs*nb) and the single-image batch (nb) — otherwise
    the first saturated crowd cold-compiles mid-eval."""
    import dataclasses
    from multiposenet_tpu.config import Config
    cfg = Config()
    cfg = dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, inp_size=128,
                                      scale_search=(0.5, 1.0), flip=False,
                                      group_size=4))
    ev = _stub_evaluator(cfg)
    # the stub disables the device path; force the two gates the warm
    # logic consults (instance attrs shadow the methods)
    ev._use_groups = lambda: True
    ev._peak_escalation_tier = lambda: 128
    shapes = ev.precompile([(160, 224), (128, 128)], bucket=64)
    for hw in shapes:
        batches = sorted(bs for s, bs in ev.called if s == hw)
        assert batches == [1, 4], (hw, batches)  # nb AND gs*nb


def test_full_pipeline_with_peaks_switch_shapes():
    """with_peaks=False must drop only the peak outputs (shape-level check,
    no compile)."""
    import jax
    from multiposenet_tpu.config import Config, ModelConfig, DataConfig
    from multiposenet_tpu.engine.inference import make_full_pipeline
    from multiposenet_tpu.models.posenet import PoseNet

    cfg = Config(model=ModelConfig(backbone="resnet50"),
                 data=DataConfig(inp_size=64))
    model = PoseNet(cfg.model)
    params = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros((1, 64, 64, 3)),
                             jnp.zeros((1, cfg.model.prn_height,
                                        cfg.model.prn_width, 17)),
                             method=PoseNet.init_all),
        jax.random.PRNGKey(0))
    imgs = jax.ShapeDtypeStruct((2, 64, 64, 3), jnp.uint8)
    full = jax.eval_shape(make_full_pipeline(model, cfg, (64, 64)).__wrapped__,
                          params, imgs)
    lean = jax.eval_shape(
        make_full_pipeline(model, cfg, (64, 64), with_peaks=False).__wrapped__,
        params, imgs)
    assert full.peaks is not None and lean.peaks is None
    assert lean.heatmaps.shape == full.heatmaps.shape == (2, 16, 16, 18)
    assert lean.detections.boxes.shape == full.detections.boxes.shape


def test_local_max_cross_matches_scipy_exactly():
    """The vectorized peak mask must equal maximum_filter(cross)==m per
    channel, including ties and edges (scipy 'reflect' boundary)."""
    from scipy.ndimage import maximum_filter
    from multiposenet_tpu.eval.multiscale import _CROSS, local_max_cross

    rng = np.random.RandomState(0)
    # quantized values force plenty of exact ties
    hm = (rng.randint(0, 4, (37, 29, 6)) / 3.0).astype(np.float32)
    hm[0, :, 0] = 1.0  # edge plateaus
    ours = local_max_cross(hm)
    for j in range(hm.shape[2]):
        ref = maximum_filter(hm[:, :, j], footprint=_CROSS) == hm[:, :, j]
        np.testing.assert_array_equal(ours[:, :, j], ref, err_msg=f"ch {j}")


def test_find_peaks_np_matches_scipy_reference():
    """Sparse site detection must reproduce the scipy maximum_filter
    formulation row-for-row (values quantized to force ties; peaks on
    edges included)."""
    import cv2
    from scipy.ndimage import maximum_filter
    from multiposenet_tpu.eval.multiscale import (
        _CROSS, _compute_resized_coords, find_peaks_np)

    def reference(heatmaps, thre1, upsamp_factor):
        out, cnt = [], 0
        for j in range(heatmaps.shape[2]):
            m = heatmaps[:, :, j]
            pb = (maximum_filter(m, footprint=_CROSS) == m) & (m > thre1)
            coords = np.array(np.nonzero(pb)[::-1]).T
            rows = np.zeros((len(coords), 4))
            for i, peak in enumerate(coords):
                x_min, y_min = np.maximum(0, peak - 2)
                x_max, y_max = np.minimum(np.array(m.T.shape) - 1, peak + 2)
                patch = m[y_min:y_max + 1, x_min:x_max + 1]
                patch = cv2.resize(patch, None, fx=upsamp_factor,
                                   fy=upsamp_factor,
                                   interpolation=cv2.INTER_CUBIC)
                loc = np.unravel_index(patch.argmax(), patch.shape)
                center = _compute_resized_coords(
                    peak[::-1] - [y_min, x_min], upsamp_factor)
                refined = loc - center
                rows[i] = tuple(int(round(v)) for v in _compute_resized_coords(
                    peak, upsamp_factor) + refined[::-1]) + (patch[loc], cnt)
                cnt += 1
            out.append(rows)
        return out

    rng = np.random.RandomState(5)
    hm = (rng.randint(0, 8, (33, 41, 5)) / 7.0).astype(np.float32)
    hm[0, 7, 1] = 1.0   # edge peak
    hm[32, 40, 2] = 1.0  # corner peak
    got = find_peaks_np(hm, thre1=0.3, upsamp_factor=4.0)
    want = reference(hm, thre1=0.3, upsamp_factor=4.0)
    for j in range(5):
        # coords + ids exact; scores to a few f32 ulp — find_peaks_np
        # rides cv2's channel-vectorized resize kernel, which accumulates
        # in a different order than the per-patch single-channel path
        # (multiscale._refine_peak_batch docstring)
        np.testing.assert_array_equal(got[j][:, [0, 1, 3]],
                                      want[j][:, [0, 1, 3]],
                                      err_msg=f"joint {j}")
        # budget: fuzzing measured deltas up to ~8.3e-7 (~7 ulps at 1.0)
        np.testing.assert_allclose(got[j][:, 2], want[j][:, 2],
                                   rtol=0, atol=2e-6, err_msg=f"joint {j}")


def test_get_outputs_device_resize_matches_host_path():
    """The on-device resize+average path must reproduce the host cv2 chain
    (heat averages, flip averages, per-scale boxes)."""
    import dataclasses
    import types
    from multiposenet_tpu.config import Config

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, inp_size=128,
                                      scale_search=(0.5, 1.0, 1.5),
                                      flip=True))
    ev_host = _stub_evaluator(cfg)   # device_resize=False inside
    ev_dev = _stub_evaluator(cfg)
    ev_dev.cfg = dataclasses.replace(
        ev_dev.cfg, eval=dataclasses.replace(ev_dev.cfg.eval,
                                             device_resize=True,
                                             device_peaks=False,
                                             # compare per-scale boxes too
                                             detect_scale1_only=False))
    from multiposenet_tpu.engine.evaluator import Evaluator
    ev_dev._accum_jit = None
    ev_dev.accum_fn = lambda: Evaluator.accum_fn(ev_dev)

    def content_pipeline(ev):
        def pipeline(hw, with_peaks=True, with_detections=True):
            def run(params, batch):
                bs = batch.shape[0]
                r = np.random.RandomState(hw[0] * 7919 + hw[1])
                hm = r.rand(bs, hw[0] // 4, hw[1] // 4, 18).astype(np.float32)
                boxes = r.rand(bs, 6, 4).astype(np.float32) * 50
                scores = np.linspace(0.9, 0.1, 6, dtype=np.float32)[None]
                return types.SimpleNamespace(
                    heatmaps=jnp.asarray(hm),
                    detections=types.SimpleNamespace(
                        scores=jnp.asarray(np.repeat(scores, bs, 0)),
                        boxes=jnp.asarray(boxes)))
            return run
        ev.pipeline = pipeline

    content_pipeline(ev_host)
    content_pipeline(ev_dev)

    ev_dev._fold_jit = None
    ev_dev.fold_fn = lambda: Evaluator.fold_fn(ev_dev)

    img = (np.random.RandomState(0).rand(160, 224, 3) * 255).astype(np.uint8)
    mult = get_multipliers(160, cfg.eval.inp_size, cfg.eval.scale_search)
    heat_h, bbox_h, flip_h, _ = ev_host._get_outputs(mult, img,
                                                     with_flip=True)
    heat_d, bbox_d, flip_d, _ = ev_dev._get_outputs(mult, img,
                                                    with_flip=True)

    # device path folds /n + flip-average on device and returns flip=None
    assert flip_d is None
    from multiposenet_tpu.eval.multiscale import average_flip_heat
    np.testing.assert_allclose(heat_d, average_flip_heat(heat_h, flip_h),
                               atol=2e-4)
    assert len(bbox_d) == len(bbox_h) == 3
    for a, b in zip(bbox_d, bbox_h):
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_get_outputs_device_peaks_matches_host_joint_list():
    """The fused on-device fold+peaks path must produce the same joint set
    as fetching the averaged map and running the host peak finder (interior
    peaks; ordering differs — device is score-major, host y-major)."""
    import dataclasses
    import types
    from multiposenet_tpu.config import Config
    from multiposenet_tpu.engine.evaluator import (
        Evaluator, peak_arrays_to_joint_list)

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, inp_size=128,
                                      scale_search=(0.5, 1.0),
                                      flip=True))

    def make_ev(device_peaks):
        ev = _stub_evaluator(cfg)
        ev.cfg = dataclasses.replace(
            ev.cfg, eval=dataclasses.replace(ev.cfg.eval, device_resize=True,
                                             device_peaks=device_peaks))
        for name in ("accum_fn", "fold_fn", "accum_fold_peaks_fn"):
            setattr(ev, "_" + name.replace("_fn", "") + "_jit", None)
            setattr(ev, name,
                    (lambda n: lambda: getattr(Evaluator, n)(ev))(name))
        # stub pipeline: gaussian-bump heatmaps so the multi-scale average
        # has clean interior peaks
        def pipeline(hw, with_peaks=True, with_detections=True):
            def run(params, batch):
                bs = batch.shape[0]
                h4, w4 = hw[0] // 4, hw[1] // 4
                yy, xx = np.mgrid[0:h4, 0:w4].astype(np.float32)
                hm = np.zeros((bs, h4, w4, 18), np.float32)
                for j, (fy, fx) in enumerate(
                        [(0.35, 0.4), (0.6, 0.55), (0.45, 0.7)]):
                    cy, cx = fy * h4, fx * w4
                    g = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / 8.0)
                    for b in range(bs):
                        hm[b, :, :, j] = 0.9 * g
                return types.SimpleNamespace(
                    heatmaps=jnp.asarray(hm),
                    detections=types.SimpleNamespace(
                        scores=jnp.full((bs, 4), 0.9, jnp.float32),
                        boxes=jnp.ones((bs, 4, 4), jnp.float32)))
            return run
        ev.pipeline = pipeline
        return ev

    from multiposenet_tpu.eval.multiscale import get_multipliers
    img = (np.random.RandomState(1).rand(160, 192, 3) * 255).astype(np.uint8)
    mult = get_multipliers(160, cfg.eval.inp_size, cfg.eval.scale_search)

    heat_h, _, _, pk_h = make_ev(False)._get_outputs(mult, img,
                                                     with_flip=True)
    assert pk_h is None and heat_h is not None
    jl_host = joint_list_from_heatmaps(heat_h[:, :, :18], 160, 1.0, 0.1)

    heat_d, _, _, peaks = make_ev(True)._get_outputs(mult, img,
                                                     with_flip=True)
    assert heat_d is None and peaks is not None
    jl_dev = np.asarray(peak_arrays_to_joint_list(*peaks)).reshape(-1, 5)

    assert len(jl_dev) == len(jl_host) > 0
    # compare as sets of (x, y, joint_type) with matching scores
    host_set = {(r[0], r[1], r[4]): r[2] for r in np.asarray(jl_host)}
    dev_set = {(r[0], r[1], r[4]): r[2] for r in jl_dev}
    assert host_set.keys() == dev_set.keys()
    for k in host_set:
        np.testing.assert_allclose(host_set[k], dev_set[k], atol=2e-4)


def test_group_dispatch_matches_single():
    """_dispatch_group_device must produce, per image, exactly what the
    single-image device dispatch produces — batch rows are independent
    through the pyramid, the forwards, and the vmapped fold+peaks."""
    import dataclasses
    import types
    from multiposenet_tpu.config import Config
    from multiposenet_tpu.engine.evaluator import Evaluator

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, inp_size=128,
                                      scale_search=(0.5, 1.0), flip=True,
                                      group_size=2))
    ev = _stub_evaluator(cfg)
    ev.cfg = dataclasses.replace(
        ev.cfg, eval=dataclasses.replace(ev.cfg.eval, device_resize=True,
                                         device_peaks=True,
                                         device_image_resize=True))
    ev._accum_fold_peaks_jit = None

    # content-dependent stub: heatmaps and detections are a pure function
    # of each batch ROW, so any cross-row mixup in the grouped path shows
    def pipeline(hw, with_peaks=True, with_detections=True):
        def run(params, batch):
            b = np.asarray(batch, np.float32) / 255.0
            bs, bh, bw, _ = b.shape
            hm = b.reshape(bs, bh // 4, 4, bw // 4, 4, 3).mean((2, 4))
            hm = np.concatenate([hm] * 6, axis=-1)
            row_mean = b.mean((1, 2, 3))
            boxes = (np.arange(1, 5, dtype=np.float32)[None, None]
                     * np.ones((bs, 3, 1), np.float32)
                     * (1.0 + row_mean)[:, None, None] * 10.0)
            scores = (np.linspace(0.9, 0.3, 3, dtype=np.float32)[None]
                      * (0.5 + row_mean)[:, None])
            return types.SimpleNamespace(
                heatmaps=jnp.asarray(hm.astype(np.float32)),
                detections=types.SimpleNamespace(
                    scores=jnp.asarray(scores.astype(np.float32)),
                    boxes=jnp.asarray(boxes.astype(np.float32))))
        return run
    ev.pipeline = pipeline

    def smooth_img(cy, cx):
        yy, xx = np.mgrid[0:160, 0:224].astype(np.float32)
        g = np.exp(-(((yy - cy) / 25.0) ** 2 + ((xx - cx) / 25.0) ** 2))
        return np.clip(g * 255, 0, 255).astype(np.uint8)[
            :, :, None].repeat(3, axis=2)

    img_a, img_b = smooth_img(60, 80), smooth_img(100, 150)
    mult = get_multipliers(160, cfg.eval.inp_size, cfg.eval.scale_search)
    singles = [ev._get_outputs(mult, img, bucket=64, with_flip=True)
               for img in (img_a, img_b)]

    grouped = ev._fetch_group_device(ev._dispatch_group_device(
        [img_a, img_b], bucket=64, with_flip=True))
    assert len(grouped) == 2
    for (sh, sb, _, sp), (gh, gb, _, gp) in zip(singles, grouped):
        assert sh is None and gh is None
        assert len(sb) == len(gb) == 2
        for x, y in zip(sb, gb):
            np.testing.assert_allclose(x, y, rtol=1e-6)
        np.testing.assert_array_equal(sp[0], gp[0])          # coords
        np.testing.assert_allclose(sp[1], gp[1], atol=1e-5)  # scores
        np.testing.assert_array_equal(sp[2], gp[2])          # valid


def test_detect_scale1_only_matches_full_results():
    """Skipping the RetinaNet branch on non-scale-1.0 dispatches must leave
    the consumed outputs untouched: identical peaks, identical scale-1.0
    boxes, empty lists elsewhere (reference consumes orig_bbox_all[1] only,
    tester.py:169)."""
    import dataclasses
    import types
    from multiposenet_tpu.config import Config

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, inp_size=128,
                                      scale_search=(0.5, 1.0, 1.5),
                                      flip=False))

    def make_ev(scale1_only):
        ev = _stub_evaluator(cfg)
        ev.cfg = dataclasses.replace(
            ev.cfg, eval=dataclasses.replace(
                ev.cfg.eval, device_resize=True, device_peaks=True,
                device_image_resize=True,
                detect_scale1_only=scale1_only))
        ev._accum_fold_peaks_jit = None
        ev.det_calls = []

        def pipeline(hw, with_peaks=True, with_detections=True):
            def run(params, batch):
                ev.det_calls.append((tuple(hw), with_detections))
                b = np.asarray(batch, np.float32) / 255.0
                bs, bh, bw, _ = b.shape
                hm = b.reshape(bs, bh // 4, 4, bw // 4, 4, 3).mean((2, 4))
                hm = np.concatenate([hm] * 6, axis=-1).astype(np.float32)
                dets = None
                if with_detections:
                    rm = b.mean((1, 2, 3))
                    dets = types.SimpleNamespace(
                        scores=jnp.asarray(
                            np.linspace(0.9, 0.3, 3, dtype=np.float32)[None]
                            * (0.5 + rm)[:, None]),
                        boxes=jnp.asarray(
                            np.arange(1, 13, dtype=np.float32).reshape(
                                1, 3, 4).repeat(bs, 0)
                            * (1.0 + rm)[:, None, None]))
                return types.SimpleNamespace(heatmaps=jnp.asarray(hm),
                                             detections=dets)
            return run
        ev.pipeline = pipeline
        return ev

    img = (np.random.RandomState(5).rand(160, 224, 3) * 255).astype(np.uint8)
    mult = get_multipliers(160, cfg.eval.inp_size, cfg.eval.scale_search)
    ev_skip, ev_full = make_ev(True), make_ev(False)
    _, bb_s, _, pk_s = ev_skip._get_outputs(mult, img, bucket=64)
    _, bb_f, _, pk_f = ev_full._get_outputs(mult, img, bucket=64)

    assert [wd for _, wd in ev_skip.det_calls] == [False, True, False]
    assert all(wd for _, wd in ev_full.det_calls)
    for a, b in zip(pk_s, pk_f):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(bb_s[1], bb_f[1], rtol=1e-6)
    assert bb_s[0] == [] and bb_s[2] == []
    assert len(bb_f[0]) and len(bb_f[2])


def test_lru_bounds_and_group_gating():
    """Device caches stay bounded (group caches divide the bound by G), and
    the grouped-dispatch gate is a single shared predicate that returns
    False (with a warning) when host-* flags disable the device path."""
    import dataclasses
    from multiposenet_tpu.config import Config
    from multiposenet_tpu.engine.evaluator import Evaluator

    ev = Evaluator.__new__(Evaluator)
    for i in range(Evaluator._DEV_CACHE_MAX + 50):
        ev._lru("_t_default", i, lambda i=i: i)
    assert len(ev.__dict__["_t_default"]) == Evaluator._DEV_CACHE_MAX
    for i in range(100):
        ev._lru("_t_group", i, lambda i=i: i, maxn=8)
    assert len(ev.__dict__["_t_group"]) == 8
    # LRU: recently-used survives eviction
    ev._lru("_t_group", 93, lambda: None)
    ev._lru("_t_group", 200, lambda: None)
    assert 93 in ev.__dict__["_t_group"]

    cfg = Config()
    ev.cfg = dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, group_size=4))
    assert ev._use_groups() is True
    ev.cfg = dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, group_size=4,
                                      device_resize=False))
    assert ev._use_groups() is False
    ev.cfg = dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, group_size=1))
    assert ev._use_groups() is False


def test_crop_shape_only_matches_crop_with_factor():
    from multiposenet_tpu.eval.multiscale import crop_shape_only
    rng = np.random.RandomState(7)
    for _ in range(40):
        h, w = rng.randint(40, 700), rng.randint(40, 700)
        dest = float(rng.uniform(30, 1300))
        bucket = int(rng.choice([0, 64, 128]))
        img = np.zeros((h, w, 3), np.uint8)
        padded, scale, real = crop_with_factor(img, dest, factor=32,
                                               pad_val=128, bucket=bucket)
        (ph, pw), scale2, real2 = crop_shape_only((h, w), dest, factor=32,
                                                  bucket=bucket)
        assert (ph, pw) == padded.shape[:2], (h, w, dest, bucket)
        assert abs(scale - scale2) < 1e-12
        assert real[:2] == real2


def test_linear_resize_coeffs_match_cv2():
    """Gather-lerp with linear_resize_coeffs == cv2.resize dsize-form
    (classic bilinear) within 1 u8 LSB."""
    import cv2
    from multiposenet_tpu.ops.resize import linear_resize_coeffs
    rng = np.random.RandomState(3)
    for _ in range(8):
        sh, sw = rng.randint(30, 500), rng.randint(30, 500)
        dh, dw = rng.randint(20, 700), rng.randint(20, 700)
        img = rng.randint(0, 256, (sh, sw, 3), np.uint8)
        ref = cv2.resize(img, (dw, dh), interpolation=cv2.INTER_LINEAR)
        iy0, iy1, wy = linear_resize_coeffs(sh, dh)
        ix0, ix1, wx = linear_resize_coeffs(sw, dw)
        f = img.astype(np.float32)
        g = f[iy0] * wy[:, None, None] + f[iy1] * (1 - wy)[:, None, None]
        o = g[:, ix0] * wx[None, :, None] + g[:, ix1] * (1 - wx)[None, :, None]
        got = np.clip(np.floor(o + 0.5), 0, 255).astype(np.uint8)
        d = np.abs(ref.astype(int) - got.astype(int))
        assert d.max() <= 1, (sh, sw, dh, dw, d.max())


def test_device_pyramid_matches_host_chain():
    """The on-device pyramid (one upload + gather-lerp) must equal the host
    crop_with_factor chain within 1 u8 LSB for both the normal and flip
    rows, with exact 128 padding."""
    import dataclasses
    from multiposenet_tpu.config import Config
    from multiposenet_tpu.engine.evaluator import Evaluator

    cfg = Config()
    ev = Evaluator.__new__(Evaluator)
    ev.cfg = cfg

    rng = np.random.RandomState(11)
    for h, w in [(160, 224), (237, 189)]:
        img = rng.randint(0, 256, (h, w, 3), np.uint8)  # BGR like imread
        img_f = img[:, ::-1, :]
        bucket = 64
        mult = get_multipliers(h, 128, (0.5, 1.0, 1.7))
        dests = [m * h for m in mult]
        ipack, wpack, dims, metas = ev._pyramid_host_args(
            h, w, dests, bucket, True)
        pad_to = 64
        hp = -(-h // pad_to) * pad_to
        wp = -(-w // pad_to) * pad_to
        src = np.zeros((hp, wp, 3), np.uint8)
        src[:h, :w] = img[:, :, ::-1]
        batches = ev._pyramid_fn(tuple(m2[0] for m2 in metas), True)(
            jnp.asarray(src), jnp.asarray(ipack), jnp.asarray(wpack),
            jnp.asarray(dims))
        for dest, ((dh, dw), (rh, rw), im_scale), got in zip(
                dests, metas, batches):
            ref, scale_ref, real_ref = crop_with_factor(
                img, dest, factor=32, pad_val=128, bucket=bucket)
            ref_f, _, _ = crop_with_factor(
                img_f, dest, factor=32, pad_val=128, bucket=bucket)
            assert (dh, dw) == ref.shape[:2]
            assert (rh, rw) == real_ref[:2]
            assert abs(im_scale - scale_ref) < 1e-12
            got = np.asarray(got)
            for row, r in ((0, ref), (1, ref_f)):
                d = np.abs(got[row].astype(int)
                           - r[:, :, ::-1].astype(int))  # ref is BGR
                assert d.max() <= 1, (dest, row, d.max())
                # pad region exact
                assert (got[row, rh:, :] == 128).all()
                assert (got[row, :, rw:] == 128).all()
