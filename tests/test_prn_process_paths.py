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

    # box overflow: 6 people into max_people=4 — still processes the first 4
    dev, _ = evaluators
    small_cfg = dataclasses.replace(
        dev.cfg, prn=dataclasses.replace(dev.cfg.prn, max_people=4))
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
