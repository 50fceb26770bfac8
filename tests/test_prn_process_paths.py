"""Evaluator.prn_process: device-grouping path == host-grouping path."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiposenet_tpu.config import Config, ModelConfig, DataConfig
from multiposenet_tpu.engine.evaluator import Evaluator
from multiposenet_tpu.models.posenet import PoseNet


@pytest.fixture(scope="module")
def evaluators():
    cfg = Config(model=ModelConfig(backbone="resnet50"),
                 data=DataConfig(inp_size=96))
    model = PoseNet(cfg.model)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)),
        jnp.zeros((1, cfg.model.prn_height, cfg.model.prn_width, 17)),
        method=PoseNet.init_all)
    dev = Evaluator(cfg, model, params)
    host_cfg = dataclasses.replace(
        cfg, prn=dataclasses.replace(cfg.prn, device_grouping=False))
    host = Evaluator(host_cfg, model, params)
    host._prn_pipeline = dev.prn_pipeline()  # share the jit
    return dev, host


def _case(rng, n_people, n_joints=6):
    joints = []
    pid = 0
    centers = rng.uniform(40, 260, (n_people, 2))
    for j in range(n_joints):
        for c in centers:
            joints.append([c[0] + rng.uniform(-8, 8),
                           c[1] + rng.uniform(-8, 8), 1.0, pid, j])
            pid += 1
    boxes = [[c[0] - 25, c[1] - 30, c[0] + 25, c[1] + 30] for c in centers]
    return joints, boxes


def test_crowded_image_capacity_clipping_is_logged(evaluators, caplog, monkeypatch):
    """Fixed PRN capacities must never clip silently (the reference is
    unbounded, tester.py:333-513): exceeding max_people or
    max_peaks_per_joint logs an explicit warning naming the config knob."""
    import logging
    from multiposenet_tpu.engine.evaluator import _joints_to_peak_arrays
    from multiposenet_tpu.utils.logging import logger as mpn_logger

    monkeypatch.setattr(mpn_logger, "propagate", True)

    # peak overflow: 5 peaks of one joint type into capacity 3
    with caplog.at_level(logging.WARNING, logger="multiposenet_tpu"):
        xy, score, valid = _joints_to_peak_arrays(
            [[10.0 * i, 5.0, 1.0, i, 0] for i in range(5)], max_peaks=3,
            context="crowd.jpg")
    assert valid[0].sum() == 3
    assert any("max_peaks_per_joint" in r.message for r in caplog.records)
    caplog.clear()

    # box overflow: 6 people into max_people=4 with escalation DISABLED —
    # still processes the first 4 and warns (the pre-escalation behavior)
    dev, _ = evaluators
    small_cfg = dataclasses.replace(
        dev.cfg, prn=dataclasses.replace(dev.cfg.prn, max_people=4,
                                         escalate_max_people=0))
    small = Evaluator(small_cfg, dev.model, dev.params)
    rng = np.random.RandomState(0)
    joints, boxes = _case(rng, n_people=6)
    with caplog.at_level(logging.WARNING, logger="multiposenet_tpu"):
        results = small.prn_process(list(map(list, joints)), boxes, "crowd.jpg", 1)
    assert any("max_people" in r.message for r in caplog.records)
    assert len(results) == 4


def test_device_and_host_prn_process_agree(evaluators):
    dev, host = evaluators
    rng = np.random.RandomState(3)
    for trial in range(6):
        joints, boxes = _case(rng, n_people=int(rng.randint(1, 4)))
        rd = dev.prn_process(list(map(list, joints)), boxes, "f", 1)
        rh = host.prn_process(list(map(list, joints)), boxes, "f", 1)
        assert len(rd) == len(rh)
        for a, b in zip(rd, rh):
            assert a["score"] == b["score"], trial
            np.testing.assert_allclose(a["keypoints"], b["keypoints"],
                                       atol=1e-3, err_msg=str(trial))
            np.testing.assert_allclose(a["bbox"], b["bbox"])


def test_prn_capacity_escalation_matches_unbounded(evaluators, caplog,
                                                   monkeypatch):
    """A crowd that overflows the base (max_peaks, max_people) tier is
    re-processed at the escalated tier and matches an evaluator whose BASE
    capacity already holds everything (the unbounded-twin check, reference
    semantics: tester.py:338-350, 400-406) — with zero truncation warnings."""
    import logging
    from multiposenet_tpu.utils.logging import logger as mpn_logger
    monkeypatch.setattr(mpn_logger, "propagate", True)

    dev, _ = evaluators
    rng = np.random.RandomState(11)
    joints, boxes = _case(rng, n_people=5)  # 5 peaks/joint, 5 boxes

    esc_cfg = dataclasses.replace(
        dev.cfg,
        peaks=dataclasses.replace(dev.cfg.peaks, max_peaks_per_joint=3,
                                  escalate_max_peaks=16),
        prn=dataclasses.replace(dev.cfg.prn, max_people=2,
                                escalate_max_people=8))
    esc = Evaluator(esc_cfg, dev.model, dev.params)
    big_cfg = dataclasses.replace(
        dev.cfg,
        peaks=dataclasses.replace(dev.cfg.peaks, max_peaks_per_joint=16),
        prn=dataclasses.replace(dev.cfg.prn, max_people=8))
    big = Evaluator(big_cfg, dev.model, dev.params)

    with caplog.at_level(logging.WARNING, logger="multiposenet_tpu"):
        res_esc = esc.prn_process(list(map(list, joints)), boxes, "crowd", 1)
        res_big = big.prn_process(list(map(list, joints)), boxes, "crowd", 1)
    assert not caplog.records, [r.message for r in caplog.records]
    assert len(res_esc) == len(res_big) == 5
    for a, b in zip(res_esc, res_big):
        assert a["score"] == b["score"]
        np.testing.assert_array_equal(a["keypoints"], b["keypoints"])
        np.testing.assert_array_equal(a["bbox"], b["bbox"])


def test_fetch_finish_escalates_on_device_peak_saturation():
    """When the base-tier device top-k saturates (a joint type fills every
    slot), the whole image is re-dispatched once at the escalated capacity
    and the escalated pass's peaks are the ones finished."""
    from multiposenet_tpu.config import PeakConfig

    ev = Evaluator.__new__(Evaluator)
    ev.cfg = Config(peaks=PeakConfig(max_peaks_per_joint=4,
                                     escalate_max_peaks=8))
    sat = (np.zeros((18, 4, 2), np.float32), np.zeros((18, 4), np.float32),
           np.ones((18, 4), bool))          # all slots valid = saturated
    esc = (np.zeros((18, 8, 2), np.float32), np.zeros((18, 8), np.float32),
           np.zeros((18, 8), bool))
    dispatches = []

    def fake_dispatch(mult, img, bucket=64, with_flip=False, max_peaks=None):
        dispatches.append(max_peaks)
        return "escalated-handle"

    def fake_fetch(handle):
        return None, [[]], None, (esc if handle == "escalated-handle" else sat)

    ev._dispatch_image_device = fake_dispatch
    ev._fetch_image_device = fake_fetch
    ev._finish_image = (lambda heat, flip, bbox, img_h, name, img_id, peaks:
                        [peaks[2].shape[1]])

    out = ev._fetch_finish_escalating("base-handle", img=None,
                                      multipliers=[1.0], bucket=64,
                                      img_h=10, name="crowd.jpg", img_id=1)
    assert out == [8] and dispatches == [8]

    # unsaturated base pass: no re-dispatch
    dispatches.clear()
    ok = (sat[0], sat[1], np.zeros((18, 4), bool))
    ev._fetch_image_device = lambda handle: (None, [[]], None, ok)
    out = ev._fetch_finish_escalating("base-handle", img=None,
                                      multipliers=[1.0], bucket=64,
                                      img_h=10, name="ok.jpg", img_id=2)
    assert out == [4] and dispatches == []

    # escalation disabled: saturation only warns, never re-dispatches
    ev.cfg = Config(peaks=PeakConfig(max_peaks_per_joint=4,
                                     escalate_max_peaks=0))
    ev._fetch_image_device = lambda handle: (None, [[]], None, sat)
    out = ev._fetch_finish_escalating("base-handle", img=None,
                                      multipliers=[1.0], bucket=64,
                                      img_h=10, name="crowd.jpg", img_id=3)
    assert out == [4] and dispatches == []
