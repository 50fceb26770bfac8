"""Differential parity against the REAL reference network (external oracle).

The strongest in-environment correctness proof available (VERDICT round 1,
item 1): build the actual reference model (/root/reference/network/posenet.py)
on CPU torch, randomize it, save its weights through the reference's own h5
checkpoint writer (network/net_utils.py:30-66), convert with
tools/convert_torch_ckpt.py, and assert that every forward path of the Flax
rebuild reproduces the torch graph's outputs:

  keypoint_forward   (posenet.py:288-318)  final + all 4 intermediate heads
  detection_forward  (posenet.py:320-335)  classification / regression / anchors
  prn_forward        (posenet.py:337-350)
  full pipeline      (posenet.py:236-285)  heatmaps + decode + clip + NMS
  loss builders      (posenet.py:352-454, losses.py:25-137)

A misread of the reference topology (layer wiring, channel order, upsample
mode, converter transpose, BN stat mapping) fails these tests; the oracle's
BN stats and RetinaNet output convs are randomized (reference_oracle.py) so
no mapping error can hide behind degenerate constants.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
h5py = pytest.importorskip("h5py")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from reference_oracle import (  # noqa: E402
    build_reference_posenet,
    import_reference,
    import_reference_net_utils,
    oracle_rng,
)

from multiposenet_tpu.config import (  # noqa: E402
    Config,
    DetectionConfig,
    ModelConfig,
)
from multiposenet_tpu.models.posenet import PoseNet  # noqa: E402
from multiposenet_tpu.ops.anchors import anchors_for_shape  # noqa: E402
from multiposenet_tpu.ops.losses import (  # noqa: E402
    detection_loss,
    keypoint_loss,
    prn_loss,
)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_converter():
    spec = importlib.util.spec_from_file_location(
        "convert_torch_ckpt", os.path.join(REPO_ROOT, "tools", "convert_torch_ckpt.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def nchw(x_nhwc: np.ndarray) -> "torch.Tensor":
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def nhwc(t: "torch.Tensor") -> np.ndarray:
    return t.detach().numpy().transpose(0, 2, 3, 1)


def assert_close(ours, ref, tol=1e-4, name=""):
    """Normalized max-error comparison: robust across output magnitudes."""
    ours = np.asarray(ours, np.float32)
    ref = np.asarray(ref, np.float32)
    assert ours.shape == ref.shape, f"{name}: shape {ours.shape} vs {ref.shape}"
    scale = max(float(np.abs(ref).max()), 1e-6)
    err = float(np.abs(ours - ref).max()) / scale
    assert err < tol, f"{name}: normalized max err {err:.3e} (scale {scale:.3e})"


class Bundle:
    def __init__(self, tmpdir):
        self.posenet_mod = import_reference()
        net_utils = import_reference_net_utils()
        self.net = build_reference_posenet(layers=50, seed=0)

        # round-trip through the reference's own h5 format + our converter
        h5_path = os.path.join(str(tmpdir), "ckpt_0.h5")
        net_utils.save_net(h5_path, self.net, epoch=7)
        conv = _load_converter()
        params, batch_stats, skipped = conv.convert(h5_path, backbone="resnet50")
        # every state_dict entry must be consumed (num_batches_tracked is
        # explicitly dropped inside convert(); nothing else may be skipped)
        assert skipped == [], f"converter skipped parameters: {skipped[:10]}"

        self.cfg = Config(
            model=ModelConfig(backbone="resnet50"),
            detection=DetectionConfig(max_detections=256, use_pallas_nms=False),
        )
        self.model = PoseNet(self.cfg.model)
        self.variables = {"params": params, "batch_stats": batch_stats}


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    return Bundle(tmp_path_factory.mktemp("ref_oracle"))


SHAPES = [(160, 160), (128, 192)]


@pytest.mark.parametrize("hw", SHAPES, ids=lambda s: f"{s[0]}x{s[1]}")
def test_keypoint_forward_parity(bundle, hw):
    rng = oracle_rng(1)
    x = rng.randn(1, hw[0], hw[1], 3).astype(np.float32)

    with torch.no_grad():
        ref_final, ref_saved = bundle.net.keypoint_forward(nchw(x))

    fn = jax.jit(lambda v, img: bundle.model.apply(
        v, img, False, method=PoseNet.keypoint_forward))
    ours_final, ours_saved = fn(bundle.variables, jnp.asarray(x))

    assert len(ours_saved) == len(ref_saved) == 5
    for i, (o, r) in enumerate(zip(ours_saved, ref_saved)):
        assert_close(o, nhwc(r), name=f"saved_for_loss[{i}]")
    assert_close(ours_final, nhwc(ref_final), name="predict_keypoint")


def test_detection_forward_parity(bundle):
    hw = (128, 192)
    rng = oracle_rng(2)
    x = rng.randn(2, hw[0], hw[1], 3).astype(np.float32)

    with torch.no_grad():
        _, ref_saved = bundle.net.detection_forward(nchw(x))
    ref_cls, ref_reg, ref_anchors = [t.numpy() for t in ref_saved]

    fn = jax.jit(lambda v, img: bundle.model.apply(
        v, img, False, method=PoseNet.detection_forward))
    ours_cls, ours_reg = fn(bundle.variables, jnp.asarray(x))

    anchors = anchors_for_shape(hw, bundle.cfg.anchors)
    assert_close(anchors, ref_anchors[0], name="anchors")
    assert_close(ours_cls, ref_cls, name="classification")
    assert_close(ours_reg, ref_reg, name="regression")


def test_prn_forward_parity(bundle):
    rng = oracle_rng(3)
    grid = rng.rand(3, 56, 36, 17).astype(np.float32)

    with torch.no_grad():
        ref_out, ref_saved = bundle.net.prn_forward(torch.from_numpy(grid))

    ours = bundle.model.apply(bundle.variables, jnp.asarray(grid), False,
                              method=PoseNet.prn_forward)
    assert_close(ours, ref_out.numpy(), name="prn_out")
    assert_close(ours, ref_saved[0].numpy(), name="prn_saved")


def _pairwise_iou_plus1(boxes: np.ndarray) -> np.ndarray:
    """+1-pixel IoU matrix (f64), the reference NMS convention (nms.c:55-58)."""
    b = boxes.astype(np.float64)
    x1, y1, x2, y2 = b.T
    area = (x2 - x1 + 1) * (y2 - y1 + 1)
    xx1 = np.maximum(x1[:, None], x1[None, :])
    yy1 = np.maximum(y1[:, None], y1[None, :])
    xx2 = np.minimum(x2[:, None], x2[None, :])
    yy2 = np.minimum(y2[:, None], y2[None, :])
    inter = np.maximum(0.0, xx2 - xx1 + 1) * np.maximum(0.0, yy2 - yy1 + 1)
    return inter / (area[:, None] + area[None, :] - inter)


SCORE_TOL = 2e-5        # cross-framework f32 noise bound on sigmoid scores
BOUNDARY_SCORE = 5e-5   # |score - 0.05|: the in-graph filter's fragile band
BOUNDARY_IOU = 3e-3     # |IoU - 0.5|: fragile greedy-suppression band


def _match_detections(ref_boxes, ref_scores, ours_boxes, ours_scores):
    """Pair up two NMS outputs; returns (matched pairs, unmatched ref ids,
    unmatched ours ids).

    Greedy NMS is chaotic at its decision boundaries: a score an ulp away
    from the 0.05 filter or a pairwise IoU an ulp away from 0.5 legitimately
    flips membership between two f32 implementations — the reference's own
    CPU (`>=`, nms.c:59) and GPU (`>`, nms_kernel.cu:68) paths disagree on
    exactly those cases.  So the assertion is: every kept box must match
    1:1 across sides UNLESS it sits in a provable boundary band.
    """
    used = np.zeros(len(ours_scores), bool)
    pairs, un_ref = [], []
    for i in range(len(ref_scores)):
        found = None
        for j in range(len(ours_scores)):
            if used[j] or abs(ref_scores[i] - ours_scores[j]) > SCORE_TOL:
                continue
            iou = _pairwise_iou_plus1(
                np.stack([ref_boxes[i], ours_boxes[j]]))[0, 1]
            if iou > 0.9:
                found = j
                break
        if found is None:
            un_ref.append(i)
        else:
            used[found] = True
            pairs.append((i, found))
    return pairs, un_ref, [j for j in range(len(ours_scores)) if not used[j]]


def _is_boundary_case(box, score, all_boxes, all_scores):
    """True when this box's keep/suppress decision sits in a fragile band."""
    if abs(score - 0.05) < BOUNDARY_SCORE:
        return True
    if len(all_boxes) == 0:
        return False
    iou = _pairwise_iou_plus1(np.concatenate([box[None], all_boxes]))[0, 1:]
    higher = all_scores > score - SCORE_TOL
    return bool(np.any(higher & (np.abs(iou - 0.5) < BOUNDARY_IOU)))


def test_full_pipeline_parity(bundle):
    """End-to-end: backbone -> heads -> anchor decode -> clip -> 0.05 filter
    -> NMS, vs the reference full-inference branch (posenet.py:236-285)."""
    from multiposenet_tpu.engine.inference import make_full_pipeline

    hw = (160, 160)
    x = oracle_rng(4).randn(1, hw[0], hw[1], 3).astype(np.float32)

    with torch.no_grad():
        ref_kp, (ref_scores, ref_class, ref_boxes) = bundle.net.forward(
            (nchw(x), "both"))
    ref_scores = ref_scores.numpy()
    ref_boxes = ref_boxes.numpy()
    assert 5 <= len(ref_scores) <= bundle.cfg.detection.max_detections, (
        f"oracle kept {len(ref_scores)} boxes — retune reference_oracle bias")

    run = make_full_pipeline(bundle.model, bundle.cfg, hw,
                             preprocess=False, with_peaks=False)
    out = run(bundle.variables, jnp.asarray(x))

    assert_close(out.heatmaps, nhwc(ref_kp), name="heatmaps")

    keep = np.asarray(out.detections.keep[0])
    ours_scores = np.asarray(out.detections.scores[0])[keep]
    ours_boxes = np.asarray(out.detections.boxes[0])[keep]

    pairs, un_ref, un_ours = _match_detections(
        ref_boxes, ref_scores, ours_boxes, ours_scores)
    # the bulk of both keep lists must match 1:1 with tight tolerances
    assert len(pairs) >= 0.8 * max(len(ref_scores), len(ours_scores)), (
        f"only {len(pairs)} of ref={len(ref_scores)}/ours={len(ours_scores)} "
        f"detections matched")
    for i, j in pairs:
        np.testing.assert_allclose(ours_boxes[j], ref_boxes[i], atol=5e-3)
        np.testing.assert_allclose(ours_scores[j], ref_scores[i], atol=SCORE_TOL)
    # every unmatched box must be a provable boundary case
    every = np.concatenate([ref_boxes, ours_boxes])
    every_sc = np.concatenate([ref_scores, ours_scores])
    for i in un_ref:
        assert _is_boundary_case(ref_boxes[i], ref_scores[i], every, every_sc), (
            f"ref box {i} (score {ref_scores[i]:.6f}) missing from ours and "
            f"not at a decision boundary")
    for j in un_ours:
        assert _is_boundary_case(ours_boxes[j], ours_scores[j], every, every_sc), (
            f"ours box {j} (score {ours_scores[j]:.6f}) missing from ref and "
            f"not at a decision boundary")


def test_keypoint_loss_parity(bundle):
    """5-term masked MSE + max/min logs vs build_keypoint_loss
    (posenet.py:367-403), on the oracle's own activations."""
    rng = oracle_rng(5)
    x = rng.randn(2, 160, 160, 3).astype(np.float32)
    heat = rng.rand(2, 40, 40, 18).astype(np.float32)
    mask = (rng.rand(2, 40, 40, 18) > 0.2).astype(np.float32)

    with torch.no_grad():
        _, ref_saved = bundle.net.keypoint_forward(nchw(x))
        ref_total, ref_logs = bundle.posenet_mod.build_keypoint_loss(
            ref_saved, nchw(heat), nchw(mask))

    ours_saved = [jnp.asarray(nhwc(t)) for t in ref_saved]
    total, logs = keypoint_loss(ours_saved, jnp.asarray(heat), jnp.asarray(mask))

    np.testing.assert_allclose(float(total), float(ref_total), rtol=1e-5)
    for k in ("heatmap_loss_k2", "heatmap_loss_k3", "heatmap_loss_k4",
              "heatmap_loss_k5", "heatmap_loss", "max_ht", "min_ht"):
        np.testing.assert_allclose(float(logs[k]), float(ref_logs[k]),
                                   rtol=1e-5, err_msg=k)


def test_detection_loss_parity(bundle):
    """Focal + smooth-L1 vs the reference FocalLoss (losses.py:25-137),
    including the ignore band, empty-annotation image, and -1 padding."""
    hw = (128, 192)
    rng = oracle_rng(6)
    x = rng.randn(2, hw[0], hw[1], 3).astype(np.float32)

    anno = -np.ones((2, 4, 5), np.float32)
    anno[0, 0] = [10.0, 12.0, 90.0, 150.0, 0.0]
    anno[0, 1] = [100.0, 30.0, 180.0, 120.0, 0.0]
    anno[0, 2] = [40.0, 60.0, 70.0, 100.0, 0.0]
    # image 1 has no boxes -> exercises the zero-loss branch (losses.py:48-52)

    with torch.no_grad():
        _, ref_saved = bundle.net.detection_forward(nchw(x))
        ref_total, ref_logs = bundle.posenet_mod.build_detection_loss(
            ref_saved, torch.from_numpy(anno))

    cls, reg = [jnp.asarray(t.numpy()) for t in ref_saved[:2]]
    anchors = jnp.asarray(anchors_for_shape(hw, bundle.cfg.anchors))
    total, logs = detection_loss(cls, reg, anchors, jnp.asarray(anno))

    np.testing.assert_allclose(float(total), float(ref_total), rtol=2e-5)
    np.testing.assert_allclose(float(logs["classification_loss"]),
                               float(ref_logs["classification_loss"]), rtol=2e-5)
    np.testing.assert_allclose(float(logs["regression_loss"]),
                               float(ref_logs["regression_loss"]), rtol=2e-5)


def test_resnet101_converter_tree_matches(tmp_path):
    """The flagship backbone (FPN101, reference fpn.py:132): every oracle
    state_dict entry maps onto the Flax tree with matching shapes (23-block
    layer3 included).  Forward parity is covered at resnet50 — the blocks
    are identical modules, only counts differ."""
    import jax
    net_utils = import_reference_net_utils()
    net = build_reference_posenet(layers=101, seed=1)
    h5_path = os.path.join(str(tmp_path), "ckpt_0.h5")
    net_utils.save_net(h5_path, net)
    conv = _load_converter()
    params, batch_stats, skipped = conv.convert(h5_path, backbone="resnet101")
    assert skipped == []

    cfg = Config(model=ModelConfig(backbone="resnet101"))
    model = PoseNet(cfg.model)
    ref = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32),
                           jnp.zeros((1, 56, 36, 17), jnp.float32),
                           method=PoseNet.init_all))

    def flat(tree, prefix=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(flat(v, prefix + (k,)))
            else:
                out[prefix + (k,)] = tuple(v.shape)
        return out

    got = {**flat(params), **flat(batch_stats, ("batch_stats",))}
    want = {**flat(ref["params"]),
            **flat(ref.get("batch_stats", {}), ("batch_stats",))}
    assert got == want


def test_prn_loss_parity(bundle):
    rng = oracle_rng(7)
    grid = rng.rand(2, 56, 36, 17).astype(np.float32)
    label = (rng.rand(2, 56, 36, 17) * 0.8).astype(np.float32)

    with torch.no_grad():
        _, ref_saved = bundle.net.prn_forward(torch.from_numpy(grid))
        ref_total, _ = bundle.posenet_mod.build_prn_loss(
            ref_saved, torch.from_numpy(label))

    ours_out = jnp.asarray(ref_saved[0].numpy())
    total, _ = prn_loss(ours_out, jnp.asarray(label))
    np.testing.assert_allclose(float(total), float(ref_total), rtol=1e-5)
