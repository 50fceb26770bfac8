"""BatchPredictor: packing, batching, ragged tails."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiposenet_tpu.config import Config, ModelConfig, DataConfig
import dataclasses

from multiposenet_tpu.engine.predictor import BatchPredictor
from multiposenet_tpu.models.posenet import PoseNet


@pytest.fixture(scope="module")
def predictor():
    cfg = Config(model=ModelConfig(backbone="resnet50"),
                 data=DataConfig(inp_size=96))
    cfg = dataclasses.replace(cfg, eval=dataclasses.replace(cfg.eval,
                                                            inp_size=96))
    model = PoseNet(cfg.model)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)),
        jnp.zeros((1, cfg.model.prn_height, cfg.model.prn_width, 17)),
        method=PoseNet.init_all)
    return BatchPredictor(cfg, model, params, batch_size=2)


def test_pack_letterbox(predictor):
    img = np.zeros((50, 100, 3), np.uint8)
    rgb, scale = predictor._pack(img)
    assert rgb.shape == (96, 96, 3)
    assert abs(scale - 100 / 96) < 1e-9


def test_predict_ragged_batch(predictor):
    rng = np.random.RandomState(0)
    imgs = [(rng.rand(60, 80, 3) * 255).astype(np.uint8) for _ in range(3)]
    out = predictor.predict(imgs)
    assert len(out) == 3            # ragged tail handled
    assert all(isinstance(r, list) for r in out)


def test_predict_stream(predictor):
    rng = np.random.RandomState(1)
    imgs = [(rng.rand(48, 48, 3) * 255).astype(np.uint8) for _ in range(5)]
    out = list(predictor.predict_stream(iter(imgs)))
    assert len(out) == 5
