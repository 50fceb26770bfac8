"""Differential parity of the EVAL host logic against the reference's OWN
implementation, executed in-process as an oracle.

Round 1 validated the eval pipeline against hand-written twins of the
reference code; these tests remove the twin-fidelity risk by importing
`evaluate/tester.py` and `network/joint_utils.py` themselves (see
reference_oracle.import_reference_tester for the two dependency stubs) and
comparing, on the same oracle weights / inputs:

  prn_process          (tester.py:333-513) — the grouping hot path
  get_joint_list / NMS (joint_utils.py:19-152) — peak finding + refine
  _handle_heat         (tester.py:318-331) — flip-average fold
  crop_with_factor     (tester.py:38-81)   — multi-scale geometry
  _get_outputs         (tester.py:264-316) — 5-scale averaged heatmaps
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("h5py")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from reference_oracle import (  # noqa: E402
    SEED_OFFSET,
    build_reference_posenet,
    import_reference_net_utils,
    import_reference_tester,
    make_reference_tester,
    oracle_rng,
)

from multiposenet_tpu.config import (  # noqa: E402
    Config,
    DetectionConfig,
    EvalConfig,
    ModelConfig,
    PeakConfig,
    PRNConfig,
)
from multiposenet_tpu.engine.evaluator import Evaluator  # noqa: E402
from multiposenet_tpu.models.posenet import PoseNet  # noqa: E402

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class EvalBundle:
    def __init__(self, tmpdir):
        self.tester_mod = import_reference_tester()
        net_utils = import_reference_net_utils()
        self.net = build_reference_posenet(layers=50, seed=0)
        self.thre1 = self._calibrate_hot(self.net)
        h5 = os.path.join(str(tmpdir), "ckpt_0.h5")
        net_utils.save_net(h5, self.net)

        spec = importlib.util.spec_from_file_location(
            "convert_torch_ckpt",
            os.path.join(REPO_ROOT, "tools", "convert_torch_ckpt.py"))
        conv = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(conv)
        params, batch_stats, _ = conv.convert(h5, backbone="resnet50")

        self.cfg = Config(
            model=ModelConfig(backbone="resnet50"),
            # the reference NMS sees EVERY candidate clearing the 0.05
            # filter; the random oracle's calibrated ~2% tail grows with
            # input area, so at the largest eval scales the default
            # fixed-K=100 would truncate candidates the reference keeps —
            # a capacity artifact of random weights, not an NMS-semantics
            # difference (trained nets emit a handful of persons)
            detection=DetectionConfig(max_detections=1024,
                                      use_pallas_nms=False),
            peaks=PeakConfig(max_peaks_per_joint=8, thre1=self.thre1),
            prn=PRNConfig(max_people=8),
            eval=EvalConfig(inp_size=128, device_resize=False,
                            device_peaks=False, device_image_resize=False),
        )
        self.model = PoseNet(self.cfg.model)
        self.variables = {"params": params, "batch_stats": batch_stats}
        self.evaluator = Evaluator(self.cfg, self.model, self.variables)
        # subnet_name='both' selects the full-inference branch, as the
        # reference eval drivers do (multipose_coco_eval.py:13)
        self.ref = make_reference_tester(self.net, inp_size=128,
                                         subnet_name="both")

    @staticmethod
    def _calibrate_hot(net):
        """Make the random oracle produce a WELL-POSED eval operating point.

        Raw random weights emit heatmaps with ~0.007 range (no peak ever
        clears any threshold) and classification logits with ~0.1 spread
        (either every anchor or none clears the 0.05/0.5 filters) — every
        protocol branch would be vacuous.  Rescale the two output convs so:
        - heatmaps span ~[0, 0.62];
        - ~2% of anchors clear the in-graph 0.05 filter and only a ~0.1%
          tail clears the 0.5 test filter (a handful of person boxes);
        and return a peak threshold at the heatmap's 99.93% quantile so
        peak sets are sparse (capacities never truncate, near-tie
        membership flips are unlikely).  Parity is unaffected — both
        stacks load the SAME calibrated weights through the h5 converter.
        """
        with torch.no_grad():
            g = torch.Generator().manual_seed(99 + SEED_OFFSET)
            x = torch.randn(1, 3, 128, 128, generator=g)
            hm, _ = net.keypoint_forward(x)
            k = 0.62 / float(hm.abs().max())
            net.convfin.weight.mul_(k)
            net.convfin.bias.mul_(k)
            hm2, _ = net.keypoint_forward(x)
            thre1 = float(torch.quantile(hm2.ravel(), 0.9993))

            out_conv = net.classificationModel.output
            out_conv.bias.zero_()
            feats = net.fpn(x)[1]
            cls = torch.cat([net.classificationModel(f) for f in feats], 1)
            m = torch.logit(cls.clamp(1e-6, 1 - 1e-6)).max(dim=2)[0].ravel()
            q98, q999 = torch.quantile(m, 0.98), torch.quantile(m, 0.999)
            s = 2.9444 / float(q999 - q98)  # logit(0.5) - logit(0.05)
            out_conv.weight.mul_(s)
            out_conv.bias.fill_(-s * float(q999))  # q999 -> logit(0.5) = 0
        return max(0.2, thre1)


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    return EvalBundle(tmp_path_factory.mktemp("ref_eval"))


# ---------------------------------------------------------------------------
# prn_process — the grouping hot path
# ---------------------------------------------------------------------------

def _grouping_case(rng, n_people, joint_types, img_wh=(300.0, 300.0)):
    """Well-separated people; rows [x, y, score, id, joint_type_17]."""
    w, h = img_wh
    centers = np.stack([rng.uniform(60, w - 60, n_people),
                        rng.uniform(60, h - 60, n_people)], axis=1)
    # keep centers apart so mutual-best decisions have clear margins
    for _ in range(50):
        d = np.linalg.norm(centers[:, None] - centers[None], axis=-1)
        np.fill_diagonal(d, 1e9)
        if d.min() > 90:
            break
        i = np.unravel_index(np.argmin(d), d.shape)[0]
        centers[i] = [rng.uniform(60, w - 60), rng.uniform(60, h - 60)]
    rows = []
    pid = 0
    for j in joint_types:
        for c in centers:
            rows.append([float(c[0] + rng.uniform(-10, 10)),
                         float(c[1] + rng.uniform(-10, 10)), 1.0, pid, j])
            pid += 1
    boxes = [[float(c[0] - 30), float(c[1] - 40),
              float(c[0] + 30), float(c[1] + 40)] for c in centers]
    return rows, boxes


def _our_prn_grids(bundle, rows, boxes):
    """Our device PRN output grids (n_boxes, gh, gw, 17) for one grouping
    case — used by the tie-aware fallback comparison below."""
    import jax.numpy as jnp

    from multiposenet_tpu.engine.inference import make_prn_pipeline

    cfg = bundle.cfg
    prn = make_prn_pipeline(bundle.model, cfg)
    num_j, num_p = 17, cfg.peaks.max_peaks_per_joint
    peak_xy = np.zeros((num_j, num_p, 2), np.float32)
    peak_score = -np.ones((num_j, num_p), np.float32)
    peak_valid = np.zeros((num_j, num_p), bool)
    fill = {j: 0 for j in range(num_j)}
    for x, y, s, pid, j in rows:
        k = fill[int(j)]
        fill[int(j)] += 1
        peak_xy[int(j), k] = (x, y)
        peak_score[int(j), k] = 1.0
        peak_valid[int(j), k] = True
    maxb = cfg.prn.max_people
    bx = np.zeros((maxb, 4), np.float32)
    bv = np.zeros((maxb,), bool)
    for k, (x1, y1, x2, y2) in enumerate(boxes):
        bx[k] = (x1, y1, x2 - x1, y2 - y1)
        bv[k] = True
    _, _, prn_out, _, _ = prn(dict(bundle.variables), jnp.asarray(peak_xy),
                              jnp.asarray(peak_score), jnp.asarray(peak_valid),
                              jnp.asarray(bx), jnp.asarray(bv))
    return np.asarray(prn_out)[:len(boxes)]


def _fallback_tie_ok(grid_ch, box_xywh, ref_xy, our_xy, rel=1e-3):
    """True iff the reference's fallback cell VALUE ties our argmax on OUR
    PRN grid — the far-flip acceptance test for v=0 entries (see the
    comment in _compare_results)."""
    gh, gw = grid_ch.shape
    bx, by, bw, bh = box_xywh

    def cell(xy):
        cx = int(round((xy[0] - bx) * gw / np.ceil(bw)))
        cy = int(round((xy[1] - by) * gh / np.ceil(bh)))
        return min(max(cy, 0), gh - 1), min(max(cx, 0), gw - 1)

    rv = grid_ch[cell(ref_xy)]
    ov = grid_ch[cell(our_xy)]
    return abs(rv - ov) <= rel * max(abs(rv), abs(ov))


def _compare_results(ref_results, our_results, bbox_atol=1e-6, kp_atol=1e-5,
                     prn_grids=None):
    """kp_atol applies to assigned (v=1) keypoints — exact when both sides
    are fed identical peak lists; when each side finds peaks from its OWN
    forward, sub-pixel refinement has a 1px granularity at stride 4 so a
    near-tie in the upsampled patch argmax can shift a coordinate one
    notch (pass kp_atol=1.01 for those paths)."""
    assert len(ref_results) == len(our_results)
    for box_i, (r, o) in enumerate(zip(ref_results, our_results)):
        assert r["image_id"] == o["image_id"]
        assert r["category_id"] == o["category_id"]
        np.testing.assert_allclose(o["bbox"], r["bbox"], atol=bbox_atol)
        np.testing.assert_allclose(o["score"], r["score"], atol=1e-6)
        rk = np.asarray(r["keypoints"], np.float64).reshape(17, 3)
        ok = np.asarray(o["keypoints"], np.float64).reshape(17, 3)
        np.testing.assert_array_equal(rk[:, 2], ok[:, 2])  # visibility
        np.testing.assert_allclose(ok[rk[:, 2] == 1], rk[rk[:, 2] == 1],
                                   atol=kp_atol)
        # v=0 fallback entries come through an argmax over the PRN output
        # grid.  When a gaussian blob's center lands mid-cell, its top-2
        # (vertically/horizontally adjacent) cells are a razor tie that
        # each framework's f32 conv noise resolves independently — the
        # coordinate then moves by exactly ONE grid-cell pitch (observed
        # at fuzz seed 3: dy = box_h/56 on 12 entries, x bit-equal).
        # Tolerance = 2 px covers one-cell flips at the case's box sizes.
        # On channels with NO planted peaks (absent joint types) the
        # softmax is near-uniform and the GLOBAL argmax itself is a razor
        # tie between far-apart cells (observed at fuzz seed 4: top-2 gap
        # 8.6e-10 on channel 13, ref's pick == our #2) — those far flips
        # are accepted iff the reference's cell VALUE ties our argmax on
        # OUR grid (rel 1e-3), which a coordinate-MAPPING bug (displacing
        # by half a box into an arbitrary-valued cell) would fail.
        far = np.abs(ok[:, :2] - rk[:, :2]).max(axis=1) > 2.0
        for j in np.where((rk[:, 2] == 0) & far)[0]:
            assert prn_grids is not None, (
                f"joint {j}: fallback xy {ok[j, :2]} vs ref {rk[j, :2]} "
                f"beyond 2 px and no PRN grids passed for tie checking")
            assert _fallback_tie_ok(prn_grids[box_i][:, :, j], o["bbox"],
                                    rk[j, :2], ok[j, :2]), (
                f"joint {j}: fallback xy {ok[j, :2]} vs ref {rk[j, :2]} "
                f"is NOT a PRN-value tie — real divergence")
        near = (rk[:, 2] == 0) & ~far
        np.testing.assert_allclose(ok[near], rk[near], atol=2.0)


def test_prn_process_matches_reference(bundle):
    rng = oracle_rng(11)
    cases = [
        _grouping_case(rng, 1, joint_types=range(17)),
        _grouping_case(rng, 3, joint_types=range(17)),
        # several joint types absent -> exercises the fallback branch
        # (tester.py:472-483) including its fill-all-joints quirk
        _grouping_case(rng, 2, joint_types=[0, 3, 7, 12]),
    ]
    with torch.no_grad():
        for i, (rows, boxes) in enumerate(cases):
            ref = bundle.ref.prn_process(
                [list(r) for r in rows], [list(b) for b in boxes], "f", i)
            ours = bundle.evaluator.prn_process(
                [list(r) for r in rows], [list(b) for b in boxes], "f", i)
            _compare_results(ref, ours,
                             prn_grids=_our_prn_grids(bundle, rows, boxes))


def test_prn_process_empty_inputs_match(bundle):
    with torch.no_grad():
        # no boxes -> [] on both sides
        rows = [[5.0, 5.0, 1.0, 0, 0]]
        assert bundle.ref.prn_process([list(rows[0])], [], "f", 0) == []
        assert bundle.evaluator.prn_process([list(rows[0])], [], "f", 0) == []
        # boxes but NO peaks: the reference's len(peaks)==0 guard is dead
        # code (peaks is always 17 type-buckets) so it emits one all-v=0
        # fallback result per box — ours must too
        ref = bundle.ref.prn_process([], [[10, 10, 60, 90]], "f", 0)
        ours = bundle.evaluator.prn_process([], [[10, 10, 60, 90]], "f", 0)
        assert len(ref) == 1
        _compare_results(ref, ours)


# ---------------------------------------------------------------------------
# peak finding: get_joint_list vs our host chain
# ---------------------------------------------------------------------------

def _planted_heatmaps(rng, gh=40, gw=32, num_j=18, n_blobs=5):
    hm = np.zeros((gh, gw, num_j), np.float32)
    yy, xx = np.mgrid[0:gh, 0:gw]
    for _ in range(n_blobs):
        j = rng.randint(num_j)
        # stay clear of the borders: the peak-refine border handling is a
        # documented deviation (CLAUDE.md); interior peaks must match exactly
        cy, cx = rng.uniform(4, gh - 5), rng.uniform(4, gw - 5)
        amp = rng.uniform(0.3, 1.0)
        hm[:, :, j] += amp * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 6.0)
    return np.clip(hm, 0, 1)


def test_get_joint_list_matches_reference(bundle):
    from network import joint_utils  # reference, via sys.path
    from multiposenet_tpu.eval.multiscale import joint_list_from_heatmaps

    rng = oracle_rng(3)
    img = np.zeros((160, 128, 3), np.float32)  # 4x the heatmap res
    param = {"thre1": 0.1}
    for trial in range(4):
        hm = _planted_heatmaps(rng, n_blobs=4 + trial)
        ref = np.asarray(joint_utils.get_joint_list(img, param, hm, 1)
                         ).reshape(-1, 5)
        ours = np.asarray(joint_list_from_heatmaps(hm, img.shape[0], 1.0,
                                                   thre1=0.1)).reshape(-1, 5)
        assert ref.shape == ours.shape, trial
        # same peaks in the same order; refined coords to float precision
        np.testing.assert_allclose(ours, ref, atol=1e-6, err_msg=str(trial))


def _make_classic_resize():
    """cv2.resize wrapper: rewrite the default-interpolation fx/fy form to
    the dsize form (restores the classic bilinear the 2018-era reference
    produced; cv2 5.x's fx form dispatches a different IPP kernel — see
    eval/multiscale.crop_with_factor's docstring).  Explicit-interpolation
    calls (the INTER_CUBIC heatmap chain) pass through untouched."""
    import cv2

    orig_resize = cv2.resize

    def classic_resize(src, dsize, *args, **kwargs):
        if dsize is None and not args and "interpolation" not in kwargs:
            fx, fy = kwargs.pop("fx"), kwargs.pop("fy")
            h, w = src.shape[:2]
            dsize = (round(w * fx), round(h * fy))
        return orig_resize(src, dsize, *args, **kwargs)

    return classic_resize


# ---------------------------------------------------------------------------
# flip fold + multi-scale geometry
# ---------------------------------------------------------------------------

def test_handle_heat_matches_reference(bundle):
    from multiposenet_tpu.eval.multiscale import average_flip_heat

    rng = oracle_rng(5)
    a = rng.rand(50, 40, 18).astype(np.float32)
    b = rng.rand(50, 40, 18).astype(np.float32)
    ref = bundle.ref._handle_heat(a, b)
    ours = average_flip_heat(a, b)
    np.testing.assert_allclose(ours, ref, atol=1e-7)


def test_crop_with_factor_matches_reference(bundle):
    """Geometry (scale factor, padded shape, valid region) must be exact.

    Pixel equality under a resize is only asserted at scale 1.0: for other
    scales the reference's `cv2.resize(im, None, fx, fy)` form dispatches
    cv2 5.x's IPP kernel whose pixels differ from the classic 2-tap
    bilinear the 2018-era reference produced — our dsize-form resize pins
    the classic path instead (documented deviation, eval/multiscale.py
    crop_with_factor docstring)."""
    from multiposenet_tpu.eval.multiscale import crop_with_factor

    rng = oracle_rng(6)
    for shape in [(123, 87), (240, 320), (64, 200)]:
        img = (rng.rand(*shape, 3) * 255).astype(np.float32)
        for dest in (96.0, 128.0, 250.0):
            r_im, r_scale, r_shape = bundle.tester_mod.crop_with_factor(
                img, dest, factor=32, pad_val=128)
            o_im, o_scale, o_shape = crop_with_factor(
                img, dest, factor=32, pad_val=128, bucket=32)
            assert r_im.shape == o_im.shape, (shape, dest)
            assert abs(r_scale - o_scale) < 1e-9
            assert tuple(r_shape[:2]) == tuple(o_shape[:2])
            # pad region is interpolation-free: must be exactly equal
            rh, rw = r_shape[:2]
            np.testing.assert_array_equal(o_im[rh:], r_im[rh:])
            np.testing.assert_array_equal(o_im[:, rw:], r_im[:, rw:])

    # scale exactly 1.0 -> no resize -> full pixel equality
    img = (rng.rand(96, 130, 3) * 255).astype(np.float32)
    r_im, r_scale, _ = bundle.tester_mod.crop_with_factor(
        img, 96.0, factor=32, pad_val=128)
    o_im, o_scale, _ = crop_with_factor(img, 96.0, factor=32, pad_val=128,
                                        bucket=32)
    assert r_scale == o_scale == 1.0
    np.testing.assert_array_equal(o_im, r_im)


def test_multiscale_heat_average_matches_reference(bundle, monkeypatch):
    """The 5-scale forward + heatmap resize-to-original + average chain
    (tester.py:264-316) on the same oracle weights.  Detection boxes are
    vacuous here (random weights never clear the hard-coded 0.5 filter,
    tester.py:308) — box-chain parity is covered by the full-pipeline test
    in test_reference_parity.py.

    While the oracle runs, cv2.resize's default-interpolation fx/fy form
    (crop_with_factor's image resize, tester.py:68) is rewritten to the
    dsize form: under cv2 5.x the fx form dispatches an IPP kernel that did
    not exist when the reference was published, and this framework pins the
    classic bilinear instead (eval/multiscale.crop_with_factor docstring).
    The explicitly-INTER_CUBIC heatmap resizes are untouched — both sides
    make those calls identically."""
    import cv2

    rng = oracle_rng(7)
    img = (rng.rand(100, 80, 3) * 255).astype(np.float32)

    with torch.no_grad():
        multiplier = bundle.ref._get_multiplier(img)
        with pytest.MonkeyPatch.context() as mp:
            mp.setattr(cv2, "resize", _make_classic_resize())
            ref_heat, ref_boxes = bundle.ref._get_outputs(multiplier, img)

    our_heat, our_boxes, _, _ = bundle.evaluator._get_outputs(
        list(multiplier), img.astype(np.uint8), bucket=32)

    assert our_heat.shape == ref_heat.shape
    scale = max(float(np.abs(ref_heat).max()), 1e-9)
    err = float(np.abs(our_heat - ref_heat).max()) / scale
    assert err < 5e-3, f"normalized heat err {err:.2e}"
    assert [len(b) for b in our_boxes] == [len(b) for b in ref_boxes]


# ---------------------------------------------------------------------------
# THE full coco_eval protocol, reference Tester.coco_eval vs our Evaluator
# ---------------------------------------------------------------------------

def _make_synthetic_coco(root, rng, n_images=3, hw=(100, 80), n_people=2):
    """Tiny val2017-shaped dataset on disk (same size for every image so
    each stack compiles one padded shape set).  `n_people` > ~4 makes the
    scenes CROWDED: boxes overlap heavily, peaks from different people
    collide inside each other's PRN crops, and the greedy assignment's
    contested branches all fire."""
    import cv2
    import json

    img_dir = os.path.join(root, "images", "val2017")
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(img_dir)
    os.makedirs(ann_dir)
    images, anns, aid = [], [], 1
    h, w = hw
    for i in range(1, n_images + 1):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        name = f"{i:012d}.jpg"
        cv2.imwrite(os.path.join(img_dir, name), img)
        images.append({"id": i, "height": h, "width": w, "file_name": name})
        for _ in range(n_people):
            cx = float(rng.uniform(20, w - 20))
            cy = float(rng.uniform(25, h - 25))
            kps = []
            for _j in range(17):
                kps += [float(cx + rng.uniform(-8, 8)),
                        float(cy + rng.uniform(-10, 10)), 2]
            anns.append({"id": aid, "image_id": i, "category_id": 1,
                         "iscrowd": 0, "num_keypoints": 17, "area": 1200.0,
                         "bbox": [cx - 15, cy - 20, 30.0, 40.0],
                         "keypoints": kps})
            aid += 1
    with open(os.path.join(ann_dir, "person_keypoints_val2017.json"), "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": [{"id": 1, "name": "person"}]}, f)


def _run_full_protocol_differential(bundle, tmp_path, rng, n_images, hw,
                                    n_people):
    """Body of the full-protocol differential (see
    test_full_coco_eval_protocol_matches_reference) for one dataset
    configuration."""
    import cv2
    import json
    import types

    from multiposenet_tpu.data.coco_json import COCOIndex
    from multiposenet_tpu.eval.cocoeval import KeypointEval

    root = str(tmp_path / "coco")
    _make_synthetic_coco(root, rng, n_images=n_images, hw=hw,
                         n_people=n_people)

    captured = {}

    class _COCOevalAdapter:
        def __init__(self, gt, dt, kind):
            assert kind == "keypoints"
            self.gt, self.dt = gt, dt
            self.params = types.SimpleNamespace(imgIds=None)

        def evaluate(self):
            self.ev = KeypointEval(self.gt, self.dt,
                                   img_ids=self.params.imgIds)

        def accumulate(self):
            captured["ref_metrics"] = self.ev.evaluate()

        def summarize(self):
            print(self.ev.summarize())

    tester_mod = bundle.tester_mod
    ref = make_reference_tester(
        bundle.net, inp_size=128, subnet_name="both", coco_root=root,
        coco_result_filename=str(tmp_path / "ref_results.json"),
        testresult_write_json=True)

    orig_gjl = tester_mod.get_joint_list
    thre1 = bundle.thre1
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(tester_mod, "COCO", COCOIndex)
        mp.setattr(tester_mod, "COCOeval", _COCOevalAdapter)
        mp.setattr(tester_mod, "get_joint_list",
                   lambda img, param, hm, scale: orig_gjl(
                       img, dict(param, thre1=thre1), hm, scale))
        mp.setattr(cv2, "resize", _make_classic_resize())
        with torch.no_grad():
            ref.coco_eval()

    with open(tmp_path / "ref_results.json") as f:
        ref_results = json.load(f)
    assert ref_results, "oracle produced no results — recalibrate the bundle"
    assert "ref_metrics" in captured

    our_file = str(tmp_path / "our_results.json")
    our_metrics = bundle.evaluator.coco_eval(
        coco_root=root, result_file=our_file, bucket=32)
    with open(our_file) as f:
        our_results = json.load(f)

    def by_img(res):
        d = {}
        for r in res:
            d.setdefault(r["image_id"], []).append(r)
        return d

    R, O = by_img(ref_results), by_img(our_results)
    assert set(R) == set(O)
    for i in sorted(R):
        assert len(R[i]) == len(O[i]), f"image {i}: {len(R[i])} vs {len(O[i])}"
        for a, b in zip(R[i], O[i]):
            np.testing.assert_allclose(b["bbox"], a["bbox"], atol=1e-2)
            np.testing.assert_allclose(b["score"], a["score"], atol=1e-6)
            ak = np.asarray(a["keypoints"], np.float64).reshape(17, 3)
            bk = np.asarray(b["keypoints"], np.float64).reshape(17, 3)
            np.testing.assert_array_equal(ak[:, 2], bk[:, 2])
            np.testing.assert_allclose(bk, ak, atol=0.51)

    for k, v in captured["ref_metrics"].items():
        np.testing.assert_allclose(our_metrics[k], v, atol=1e-6, err_msg=k)


def test_full_coco_eval_protocol_matches_reference(bundle, tmp_path):
    """Run the reference's ENTIRE Tester.coco_eval (tester.py:130-193) —
    multi-scale + flip forwards, heatmap averaging, peak finding, neck
    drop, PRN grouping, COCO reorder, loadRes, OKS scoring — against our
    Evaluator.coco_eval on the same oracle weights and images, and demand
    result-level AND AP-table agreement.

    pycocotools is absent, so the reference's COCO/COCOeval symbols are
    bound to OUR COCOIndex (its pycocotools-compatible API incl. loadRes)
    and an adapter over OUR KeypointEval — both sides therefore score
    through one scorer and the AP comparison isolates the result lists.
    The hard-coded thre1=0.1 (tester.py:157) is lifted to the bundle's
    calibrated operating point on both sides."""
    _run_full_protocol_differential(bundle, tmp_path, oracle_rng(21),
                                    n_images=3, hw=(100, 80), n_people=2)


@pytest.mark.parametrize("hw,n_people",
                         [((100, 80), 6), ((144, 112), 7)])
def test_full_protocol_crowded_scenes(bundle, tmp_path, hw, n_people):
    """The same end-to-end protocol differential on CROWDED multi-person
    scenes at two additional input sizes (the sparse 2-person case above is
    the third): 6-7 heavily overlapping people per image force contested
    peak-to-person assignments, cross-person peaks inside each PRN crop,
    cell collisions, and maxDets-relevant result counts — the regime where
    the reference's grouping quirks (tester.py:431-483) actually bite."""
    _run_full_protocol_differential(bundle, tmp_path,
                                    oracle_rng(23 + n_people),
                                    n_images=2, hw=hw, n_people=n_people)


# ---------------------------------------------------------------------------
# single-scale demo path: reference Tester.test() vs our Evaluator
# ---------------------------------------------------------------------------

def test_demo_path_matches_reference(bundle, tmp_path):
    """The reference's demo inference (tester.py:195-254: single-scale
    forward, host peak finding, 0.5 box filter, prn_process) vs our
    run_image (device peaks + fused pipeline) on the same oracle weights.

    The input is square at inp_size so the reference's float32-resize vs
    our uint8 path is bit-identical (documented deviation otherwise), and
    an image seed is chosen whose peaks stay clear of the heatmap border
    (peak-refine border handling is a documented deviation)."""
    import cv2
    import json

    tester_mod = bundle.tester_mod
    from network import joint_utils  # reference

    # pick an image whose ORACLE-side peaks are all >=3 cells from the
    # 32x32 heatmap border (border refine handling deviates by design)
    img = None
    for seed in range(31 + SEED_OFFSET, 181 + SEED_OFFSET):
        cand = (np.random.RandomState(seed).rand(128, 128, 3) * 255
                ).astype(np.uint8)
        from datasets.coco_data.preprocessing import resnet_preprocess
        inp = torch.from_numpy(
            resnet_preprocess(cand.astype(np.float32))[None])
        with torch.no_grad():
            hm, _ = bundle.net.keypoint_forward(inp)
        hm = hm[0].numpy().transpose(1, 2, 0)
        ok = True
        found_any = False
        for j in range(18):
            pk = joint_utils.find_peaks({"thre1": bundle.thre1}, hm[:, :, j])
            for x, y in pk:
                found_any = True
                if not (3 <= x <= hm.shape[1] - 4 and 3 <= y <= hm.shape[0] - 4):
                    ok = False
        if ok and found_any:
            img = cand
            break
    if img is None:
        # whether any random image yields only interior peaks is a property
        # of the random oracle's weights, not a parity claim — some fuzz
        # seeds (MPN_ORACLE_SEED) produce border-hugging heatmaps for every
        # candidate; the border behavior itself is a documented deviation
        pytest.skip("no border-free demo image in 150 candidate seeds for "
                    "this oracle net")

    data_dir = tmp_path / "demo_in"
    out_dir = tmp_path / "demo_out"
    data_dir.mkdir()
    out_dir.mkdir()
    cv2.imwrite(str(data_dir / "scene1.png"), img)  # lossless

    ref = make_reference_tester(
        bundle.net, inp_size=128, subnet_name="both",
        testdata_dir=str(data_dir) + "/", testresult_dir=str(out_dir) + "/",
        testresult_write_image=False, testresult_write_json=True)

    orig_gjl = tester_mod.get_joint_list
    thre1 = bundle.thre1
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(tester_mod, "get_joint_list",
                   lambda im, param, hm, scale: orig_gjl(
                       im, dict(param, thre1=thre1), hm, scale))
        with torch.no_grad():
            ref.test()

    with open(out_dir / "multipose_results.json") as f:
        ref_results = json.load(f)

    our_results, _ = bundle.evaluator.run_image(img, "scene1.png")
    assert ref_results, "oracle demo produced no people — retune calibration"
    _compare_results(ref_results, our_results, bbox_atol=1e-3, kp_atol=1.01)


# ---------------------------------------------------------------------------
# demo renderer: reference joint_utils.draw/plot_result vs eval/render
# ---------------------------------------------------------------------------

def test_render_matches_reference_pixel_exact(bundle):
    """draw/plot_result (joint_utils.py:155-202) vs our renderer: identical
    cv2 primitives on identical inputs -> byte-identical canvases."""
    from network import joint_utils  # reference
    from multiposenet_tpu.eval.render import plot_results

    rng = oracle_rng(9)
    img = (rng.rand(160, 200, 3) * 255).astype(np.uint8)
    results = []
    for p in range(3):
        kps = []
        cx, cy = rng.uniform(40, 160), rng.uniform(40, 120)
        for j in range(17):
            v = float(rng.rand() > 0.3)
            kps += [float(cx + rng.uniform(-25, 25)),
                    float(cy + rng.uniform(-30, 30)), v]
        results.append({"bbox": [float(cx - 30), float(cy - 35), 60.0, 70.0],
                        "keypoints": kps})

    ref_canvas = joint_utils.plot_result(img.copy(), results)
    our_canvas = plot_results(img.copy(), results)
    np.testing.assert_array_equal(our_canvas, ref_canvas)
