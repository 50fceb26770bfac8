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
