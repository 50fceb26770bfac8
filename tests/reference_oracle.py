"""Load the reference MultiPoseNet.pytorch network as an external test ORACLE.

The reference repo (/root/reference) is imported in place — nothing is
vendored — with the minimal shims that let its PyTorch-0.4-era, CUDA-only
code run under CPU torch 2.x:

* ``lib.nms.pth_nms`` is stubbed BEFORE import with a small Python
  re-implementation of the reference GPU NMS semantics (+1-pixel IoU,
  strict ``>`` suppression, score-descending traversal — reference
  lib/nms/src/nms_kernel.cu:16-70; the CPU path nms.c:59 uses ``>=`` but
  the published eval always ran the GPU kernel).  This makes the
  full-pipeline forward branch (reference network/posenet.py:236-285)
  runnable too, not just the three subnet branches.
* ``torch.Tensor.cuda`` / ``torch.nn.Module.cuda`` become identity — the
  reference hard-codes ``.cuda()`` in Anchors.forward (anchors.py:37), the
  focal loss (losses.py:50-135) and the loss builders (posenet.py:371,434).
* ``int - bool_tensor`` is re-enabled (torch >= 1.3 forbids it) so the
  reference focal loss's dead ``negative_indices = 1 - positive_indices``
  statement (losses.py:124, result never used) doesn't abort the forward.
* ``torch.tensor(0, requires_grad=True)`` (losses.py:50-51,135 zero-loss
  branch) is promoted to float32 — torch 2.x forbids grad on int tensors;
  the reference immediately calls ``.float()`` on it anyway.

Used only by tests: the oracle provides ground-truth activations/losses for
differential parity of the converter + Flax model (test_reference_parity.py).
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"

# Seed-offset fuzz knob: MPN_ORACLE_SEED=k shifts EVERY oracle seed (model
# init and all test inputs) by k*1000, re-running the whole differential
# harness on fresh weights + data.  Default 0 = the pinned CI seeds.
# Sweep with tools/fuzz_reference_parity.sh.
SEED_OFFSET = int(os.environ.get("MPN_ORACLE_SEED", "0")) * 1000


def oracle_rng(seed: int) -> np.random.RandomState:
    """RandomState for oracle test inputs, shifted by MPN_ORACLE_SEED."""
    return np.random.RandomState(seed + SEED_OFFSET)


_cache: dict = {}


def reference_nms(dets, thresh):
    """Python twin of the reference GPU NMS (lib/nms/src/nms_kernel.cu:16-70).

    dets: torch (N, 5) [x1, y1, x2, y2, score].  Returns kept indices into
    `dets` in score-descending order, like lib/nms/pth_nms.py:28-46.
    """
    import torch

    d = dets.detach().cpu().numpy().astype(np.float64)
    x1, y1, x2, y2, sc = d.T
    areas = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    order = np.argsort(-sc, kind="stable")
    suppressed = np.zeros(len(d), dtype=bool)
    keep = []
    for _i, i in enumerate(order):
        if suppressed[i]:
            continue
        keep.append(i)
        rest = order[_i + 1:]
        xx1 = np.maximum(x1[i], x1[rest])
        yy1 = np.maximum(y1[i], y1[rest])
        xx2 = np.minimum(x2[i], x2[rest])
        yy2 = np.minimum(y2[i], y2[rest])
        w = np.maximum(0.0, xx2 - xx1 + 1.0)
        h = np.maximum(0.0, yy2 - yy1 + 1.0)
        inter = w * h
        iou = inter / (areas[i] + areas[rest] - inter)
        suppressed[rest[iou > thresh]] = True
    return torch.from_numpy(np.asarray(keep, dtype=np.int64))


def import_reference():
    """Import /root/reference's `network.posenet` module (cached)."""
    if "posenet" in _cache:
        return _cache["posenet"]
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    _orig_rsub = torch.Tensor.__rsub__

    def _rsub(self, other):
        if isinstance(self, torch.Tensor) and self.dtype == torch.bool:
            return other - self.to(torch.uint8)
        return _orig_rsub(self, other)

    torch.Tensor.__rsub__ = _rsub

    _orig_tensor = torch.tensor

    def _tensor(data, *a, **k):
        if k.get("requires_grad") and isinstance(data, int):
            k = dict(k, dtype=torch.float32)
        return _orig_tensor(data, *a, **k)

    torch.tensor = _tensor

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    stub = types.ModuleType("lib.nms.pth_nms")
    stub.pth_nms = reference_nms
    sys.modules["lib.nms.pth_nms"] = stub

    from network import posenet  # noqa: E402  (reference code, external oracle)

    _cache["posenet"] = posenet
    return posenet


def import_reference_net_utils():
    """Reference checkpoint I/O (network/net_utils.py) for h5 round-trips."""
    import_reference()
    from network import net_utils  # noqa: E402

    return net_utils


def import_reference_augmentation():
    """Reference ImageAugmentation.py as an oracle.

    Pure numpy/cv2/stdlib-random code (datasets/coco_data/
    ImageAugmentation.py) — no torch needed, only the sys.path entry.
    """
    import sys
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import warnings
    with warnings.catch_warnings():
        # its `from scipy import misc` import is deprecated upstream
        warnings.simplefilter("ignore", DeprecationWarning)
        from datasets.coco_data import ImageAugmentation  # noqa: E402
    return ImageAugmentation


def import_reference_tester():
    """Import the reference's eval engine (evaluate/tester.py) with stubs
    for its two absent dependencies:

    * ``pycocotools`` — empty COCO/COCOeval shells (only ``coco_eval``
      touches them; the methods under differential test don't);
    * ``skimage.filters.gaussian`` — the exact scipy formulation skimage
      wraps (``ndi.gaussian_filter(float64, sigma, mode='nearest',
      truncate=4.0)``); ``prn_gaussian.gaussian`` IS this import (its own
      ``def gaussian`` is commented out, prn_gaussian.py:64-73).
    """
    if "tester" in _cache:
        return _cache["tester"]
    import_reference()
    from scipy import ndimage as ndi

    pyco = types.ModuleType("pycocotools")
    coco_mod = types.ModuleType("pycocotools.coco")
    cocoeval_mod = types.ModuleType("pycocotools.cocoeval")
    coco_mod.COCO = type("COCO", (), {})
    cocoeval_mod.COCOeval = type("COCOeval", (), {})
    pyco.coco = coco_mod
    pyco.cocoeval = cocoeval_mod
    sys.modules.setdefault("pycocotools", pyco)
    sys.modules.setdefault("pycocotools.coco", coco_mod)
    sys.modules.setdefault("pycocotools.cocoeval", cocoeval_mod)

    def skimage_gaussian(image, sigma=1, output=None, mode="nearest",
                         cval=0, preserve_range=False, truncate=4.0, **kw):
        return ndi.gaussian_filter(np.asarray(image, np.float64), sigma,
                                   mode=mode, cval=cval, truncate=truncate)

    skimage = types.ModuleType("skimage")
    filters = types.ModuleType("skimage.filters")
    filters.gaussian = skimage_gaussian
    skimage.filters = filters
    sys.modules.setdefault("skimage", skimage)
    sys.modules.setdefault("skimage.filters", filters)

    from evaluate import tester  # noqa: E402

    _cache["tester"] = tester
    return tester


def make_reference_tester(net, **param_overrides):
    """A reference Tester wired to an in-process oracle net, skipping
    __init__'s ckpt-loading/DataParallel/cuda machinery (tester.py:110-129).
    poseNet.forward accepts the ``[tensor, subnet_name]`` lists Tester
    passes, so the bare module stands in for the DataParallel wrapper."""
    tester = import_reference_tester()
    t = tester.Tester.__new__(tester.Tester)
    params = tester.TestParams()
    for k, v in param_overrides.items():
        setattr(params, k, v)
    t.params = params
    t.model = net
    t.batch_timer = None
    t.data_timer = None
    t.val_data = None
    t.batch_processor = None
    return t


def build_reference_posenet(layers: int = 50, seed: int = 0):
    """Construct a randomly initialized reference poseNet in eval mode.

    Beyond the reference's own init (conv N(0, 0.01), posenet.py:213-218),
    every tensor that the reference leaves at a degenerate constant is
    randomized so the parity tests can actually observe mapping mistakes:

    - BatchNorm running stats / affine params (torch defaults 0/1/1/0 would
      hide a mean<->var or scale<->bias converter swap),
    - the RetinaNet output convs (the reference zeros their weights,
      posenet.py:205-209, which would make cls/reg independent of the trunk).
      The classification bias is re-centered so that only a small tail of
      anchors passes the in-graph 0.05 score filter (posenet.py:271), giving
      the full-pipeline NMS parity test a realistic, bounded candidate set.
    """
    import torch

    posenet = import_reference()
    seed = seed + SEED_OFFSET
    g = torch.Generator().manual_seed(seed)
    # poseNet.__init__ draws conv weights from the GLOBAL torch RNG
    # (posenet.py:213-218) — seed it so the oracle is deterministic.
    torch.manual_seed(seed)
    net = posenet.poseNet(layers)
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.1, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
                m.weight.normal_(1.0, 0.1, generator=g)
                m.bias.normal_(0.0, 0.05, generator=g)
        # Unit-gain (He) init for the RetinaNet trunks: the reference's
        # N(0, 0.01) shrinks activations ~20x per layer, leaving the
        # classification logits with an ulp-scale spread around the 0.05
        # filter — every greedy-NMS decision would sit on a tie.  With
        # sqrt(2/fan_in) the logit spread is O(0.1) and decision margins
        # are real.  Parity is init-independent; this only makes the
        # full-pipeline test's discrete decisions well-separated.
        fpn = net.fpn
        det_fpn_convs = [fpn.conv6, fpn.conv7, fpn.latlayer1, fpn.latlayer2,
                         fpn.latlayer3, fpn.toplayer0, fpn.toplayer1,
                         fpn.toplayer2]
        head_trunks = [c for head in (net.regressionModel,
                                      net.classificationModel)
                       for c in (head.conv1, head.conv2, head.conv3, head.conv4)]
        for conv in det_fpn_convs + head_trunks:
            fan_in = conv.weight.shape[1] * conv.weight.shape[2] * conv.weight.shape[3]
            conv.weight.normal_(0.0, (2.0 / fan_in) ** 0.5, generator=g)
            conv.bias.normal_(0.0, 0.01, generator=g)
        net.regressionModel.output.weight.normal_(0.0, 0.01, generator=g)
        net.regressionModel.output.bias.normal_(0.0, 0.05, generator=g)
        net.classificationModel.output.weight.normal_(0.0, 0.01, generator=g)
        net.classificationModel.output.bias.zero_()
    net.eval()

    # Calibrate the classification bias so ~0.5% of anchors clear the
    # in-graph 0.05 score filter (posenet.py:271): a fixed bias would make
    # the candidate set all-or-nothing because the randomized net's logit
    # spread is small.  A probe forward finds the logit quantile.
    with torch.no_grad():
        probe = torch.randn(1, 3, 160, 160, generator=g)
        _, saved = net.detection_forward(probe)
        cls = saved[0].clamp(1e-6, 1 - 1e-6)
        logits = torch.logit(cls).max(dim=2)[0].ravel()
        q = torch.quantile(logits, 0.995)
        thresh_logit = float(np.log(0.05 / 0.95))
        net.classificationModel.output.bias.fill_(thresh_logit - float(q))
    return net
