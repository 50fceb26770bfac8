"""StableHLO serving artifact (engine/export_model.py).

The artifact must be a faithful stand-in for the live pipeline: the
deserialized module's outputs are compared ARRAY-EXACT against
make_e2e_pose_pipeline on the same platform (both lower the identical
XLA-NMS graph), and BatchPredictor.from_exported must emit the same
person dicts as a live BatchPredictor on the same weights.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiposenet_tpu.config import Config, ModelConfig, DataConfig
from multiposenet_tpu.engine.export_model import (
    export_pose_pipeline,
    load_pose_pipeline,
)
from multiposenet_tpu.engine.inference import make_e2e_pose_pipeline
from multiposenet_tpu.engine.predictor import BatchPredictor
from multiposenet_tpu.models.posenet import PoseNet


@pytest.fixture(scope="module")
def setup():
    cfg = Config(model=ModelConfig(backbone="resnet50"),
                 data=DataConfig(inp_size=96))
    cfg = dataclasses.replace(cfg, eval=dataclasses.replace(cfg.eval,
                                                            inp_size=96))
    model = PoseNet(cfg.model)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)),
        jnp.zeros((1, cfg.model.prn_height, cfg.model.prn_width, 17)),
        method=PoseNet.init_all)
    # the production artifact shape: lowered for tpu AND cpu, called here
    # on cpu — proves the multi-platform module dispatches correctly
    blob = export_pose_pipeline(model, cfg, params, batch=2)
    return cfg, model, params, blob


def test_signature_recovered_from_artifact(setup):
    _, _, _, blob = setup
    sp = load_pose_pipeline(blob)
    assert sp.batch == 2
    assert sp.inp_size == 96
    assert sp.platforms == ("tpu", "cpu")


def test_roundtrip_matches_live_pipeline(setup):
    cfg, model, params, blob = setup
    # the exported module pins the portable XLA NMS; build the live twin
    # with the same pin so both sides lower the identical graph
    cfg_x = dataclasses.replace(
        cfg, detection=dataclasses.replace(cfg.detection,
                                           use_pallas_nms=False))
    live = make_e2e_pose_pipeline(model, cfg_x, (96, 96))
    sp = load_pose_pipeline(blob)

    rng = np.random.RandomState(3)
    images = (rng.rand(2, 96, 96, 3) * 255).astype(np.uint8)
    scales = np.array([1.0, 1.25], np.float32)

    _, a_live = live(params, jnp.asarray(images), jnp.asarray(scales))
    a_exp = sp(jnp.asarray(images), jnp.asarray(scales))
    for name, want, got in zip(a_live._fields, a_live, a_exp):
        np.testing.assert_array_equal(
            np.asarray(want), np.asarray(got),
            err_msg=f"field {name} diverged between live and exported")


def test_from_exported_predictor_matches_live(setup, tmp_path):
    cfg, model, params, blob = setup
    path = tmp_path / "pose.stablehlo"
    path.write_bytes(blob)

    live = BatchPredictor(cfg, model, params, batch_size=2)
    aot = BatchPredictor.from_exported(path)  # os.PathLike accepted
    assert aot.batch_size == 2 and aot.inp == 96

    rng = np.random.RandomState(7)
    imgs = [(rng.rand(60 + 8 * i, 80, 3) * 255).astype(np.uint8)
            for i in range(3)]
    r_live = live.predict(imgs)
    r_aot = aot.predict(imgs)
    assert len(r_live) == len(r_aot) == 3
    for people_l, people_a in zip(r_live, r_aot):
        assert len(people_l) == len(people_a)
        for pl, pa in zip(people_l, people_a):
            assert pl.keys() == pa.keys()
            np.testing.assert_allclose(
                np.asarray(pl["keypoints"], np.float64),
                np.asarray(pa["keypoints"], np.float64), rtol=0, atol=0)
