"""make_e2e_pose_pipeline: the one-dispatch demo path must reproduce the
per-image host path (Evaluator.run_image / prn_process) exactly, and its
mesh-sharded variant must reproduce the single-device variant.

Thresholds are lowered so a random-init model emits real detections
(classification scores sit near the RetinaNet prior ~0.01) and real peaks —
otherwise every box/peak list is empty and the test is vacuous.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiposenet_tpu.config import Config, DataConfig, ModelConfig
from multiposenet_tpu.engine.evaluator import (
    Evaluator,
    drop_neck,
    peak_arrays_to_joint_list,
)
from multiposenet_tpu.engine.inference import (
    format_pose_batch,
    make_e2e_pose_pipeline,
    make_sharded_e2e_pipeline,
)
from multiposenet_tpu.models.posenet import PoseNet

SIZE = 96
SCALE = 1.5  # exactly representable: host f64 and device f32 scaling agree


def _cfg():
    cfg = Config(model=ModelConfig(backbone="resnet50"),
                 data=DataConfig(inp_size=SIZE))
    return dataclasses.replace(
        cfg,
        eval=dataclasses.replace(cfg.eval, inp_size=SIZE),
        detection=dataclasses.replace(
            cfg.detection, score_thresh=0.0, test_score_thresh=0.005,
            max_detections=32),
        # random-init heatmaps sit at ~±2e-5 — threshold well below that
        peaks=dataclasses.replace(cfg.peaks, thre1=1e-6,
                                  max_peaks_per_joint=8),
        prn=dataclasses.replace(cfg.prn, max_people=8),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    model = PoseNet(cfg.model)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)),
        jnp.zeros((1, cfg.model.prn_height, cfg.model.prn_width, 17)),
        method=PoseNet.init_all)
    imgs = jnp.asarray(
        (np.random.RandomState(7).rand(4, SIZE, SIZE, 3) * 255)
        .astype(np.uint8))
    return cfg, model, params, imgs


def _host_path_results(cfg, model, params, imgs):
    """The round-2 per-image protocol: batched detect+peaks pipeline, then
    host joint-list conversion + Evaluator.prn_process per image."""
    ev = Evaluator(cfg, model, params)
    out = ev.pipeline((SIZE, SIZE))(params, imgs)
    coords, scores, valid, dscores, dboxes = jax.device_get(
        (out.peaks.coords, out.peaks.scores, out.peaks.valid,
         out.detections.scores, out.detections.boxes))
    results = []
    for i in range(imgs.shape[0]):
        joint_list = peak_arrays_to_joint_list(
            coords[i], scores[i], valid[i], SCALE)
        joints = drop_neck(np.asarray(joint_list))
        keep = dscores[i] > cfg.detection.test_score_thresh
        boxes = (dboxes[i][keep] * SCALE).tolist()
        results.append(ev.prn_process(joints, boxes))
    return results


def _assert_same_results(got, expected):
    assert len(got) == len(expected)
    nonempty = 0
    for g_img, e_img in zip(got, expected):
        assert len(g_img) == len(e_img)
        nonempty += bool(e_img)
        for g, e in zip(g_img, e_img):
            assert g["category_id"] == e["category_id"] == 1
            np.testing.assert_allclose(g["bbox"], e["bbox"], atol=1e-5)
            np.testing.assert_allclose(g["score"], e["score"], atol=1e-9)
            np.testing.assert_allclose(g["keypoints"], e["keypoints"],
                                       atol=1e-4)
    assert nonempty >= 2, "too few non-empty images — test is near-vacuous"


@pytest.mark.slow  # model init + prn_forward compile (~4 min on CPU)
def test_fused_prn_mlp_matches_module(setup):
    """cfg.prn.fused_mlp applies the SAME checkpoint params through
    engine/inference._prn_mlp_eval (flatten fused into the boundary
    Denses) — the dot products are reorderings of the module's, so the
    outputs must agree to f32 reduction noise on realistic grids."""
    from multiposenet_tpu.engine.inference import _prn_mlp_eval

    cfg, model, params, _ = setup
    gh, gw = cfg.model.prn_height, cfg.model.prn_width
    rng = np.random.RandomState(3)
    # realistic PRN input: sparse gaussian-ish marks in [0, 1]
    grids = np.zeros((5, gh, gw, 17), np.float32)
    for b in range(5):
        for j in range(17):
            grids[b, rng.randint(gh), rng.randint(gw), j] = 1.0
    grids = jnp.asarray(grids)

    ref = model.apply(params, grids, method=PoseNet.prn_forward)
    fused = _prn_mlp_eval(params["params"]["prn"], grids, jnp.float32)
    assert fused.shape == ref.shape == (5, gh, gw, 17)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-5, atol=1e-8)
    # rows still normalize (whole-vector softmax; 34k-element f32 sum)
    np.testing.assert_allclose(np.asarray(fused).reshape(5, -1).sum(1),
                               1.0, rtol=2e-4)

    # bf16 compute: same quantization class as the module's bf16 path
    fused_bf = _prn_mlp_eval(params["params"]["prn"], grids, jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(fused_bf, np.float32),
                               np.asarray(ref), rtol=0.05, atol=1e-6)


@pytest.mark.slow  # compile-heavy (tiering: docs/TESTING.md)
def test_e2e_matches_per_image_host_path(setup):
    cfg, model, params, imgs = setup
    expected = _host_path_results(cfg, model, params, imgs)

    e2e = make_e2e_pose_pipeline(model, cfg, (SIZE, SIZE))
    _, assigns = e2e(params, imgs,
                     jnp.full((imgs.shape[0],), SCALE, jnp.float32))
    got = format_pose_batch(jax.device_get(assigns))
    _assert_same_results(got, expected)
    # sanity: somebody actually got grouped with a real pose score
    assert any(r["score"] > 0 for img in expected for r in img)


@pytest.mark.slow  # compile-heavy (tiering: docs/TESTING.md)
def test_bf16_prn_pipeline_matches_f32_structure(setup):
    """Under a bf16 compute dtype the PRN pipeline builds its grids in
    bf16 (engine/inference.py grid_dt): the integer/boolean outputs
    (inside, x0, y0) must be BIT-identical to the f32 config's, and the
    score tables within the bf16 drift band (the MLP itself also runs
    bf16 there — same rounding the --bf16 eval toggle already carries,
    ablation-bounded in docs/PERF.md)."""
    from multiposenet_tpu.engine.inference import make_prn_pipeline

    cfg, model, params, _ = setup
    cfg16 = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model,
                                       compute_dtype=jnp.bfloat16))
    rng = np.random.RandomState(3)
    J, P, B = 17, cfg.peaks.max_peaks_per_joint, cfg.prn.max_people
    peak_xy = jnp.asarray(rng.rand(J, P, 2).astype(np.float32) * SIZE)
    peak_valid = jnp.asarray(rng.rand(J, P) > 0.4)
    peak_score = jnp.where(peak_valid, 1.0, -1.0)
    boxes = np.zeros((B, 4), np.float32)
    boxes[:, :2] = rng.rand(B, 2) * SIZE * 0.4
    boxes[:, 2:] = 16 + rng.rand(B, 2) * (SIZE * 0.5)
    box_valid = jnp.ones((B,), bool)
    args = (peak_xy, peak_score, peak_valid, jnp.asarray(boxes), box_valid)

    t32, in32, _, x32, y32 = make_prn_pipeline(model, cfg)(params, *args)
    t16, in16, _, x16, y16 = make_prn_pipeline(
        PoseNet(cfg16.model), cfg16)(params, *args)

    np.testing.assert_array_equal(np.asarray(in16), np.asarray(in32))
    np.testing.assert_array_equal(np.asarray(x16), np.asarray(x32))
    np.testing.assert_array_equal(np.asarray(y16), np.asarray(y32))
    # tables are window-sums of ~1e-4 softmax mass: drift stays well
    # inside the band measured for the full --bf16 toggle
    np.testing.assert_allclose(np.asarray(t16), np.asarray(t32),
                               atol=2e-4)
    assert float(np.abs(np.asarray(t32)).max()) > 0  # non-vacuous


@pytest.mark.slow  # compile-heavy (tiering: docs/TESTING.md)
def test_sharded_e2e_matches_single_device(setup):
    """Item: mesh-sharded serving. The batch-sharded pipeline over the full
    8-device CPU mesh must produce the same assignments as the unsharded
    jit."""
    from multiposenet_tpu.parallel import make_mesh

    cfg, model, params, imgs = setup
    mesh = make_mesh()
    n = mesh.devices.size
    imgs8 = jnp.concatenate([imgs, imgs], axis=0)[:n]
    scales = jnp.full((imgs8.shape[0],), SCALE, jnp.float32)

    base = make_e2e_pose_pipeline(model, cfg, (SIZE, SIZE))
    sharded = make_sharded_e2e_pipeline(model, cfg, (SIZE, SIZE), mesh)
    _, a0 = base(params, imgs8, scales)
    _, a1 = sharded(params, imgs8, scales)
    r0 = format_pose_batch(jax.device_get(a0))
    r1 = format_pose_batch(jax.device_get(a1))
    _assert_same_results(r1, r0)


@pytest.mark.slow  # compile-heavy (tiering: docs/TESTING.md)
def test_batch_predictor_mesh(setup):
    """BatchPredictor(mesh=...) shards each serving batch over the mesh and
    returns the same people as the single-device predictor."""
    from multiposenet_tpu.engine.predictor import BatchPredictor
    from multiposenet_tpu.parallel import make_mesh

    cfg, model, params, _ = setup
    rng = np.random.RandomState(3)
    imgs = [(rng.rand(70, 90, 3) * 255).astype(np.uint8) for _ in range(5)]

    mesh = make_mesh()
    pred1 = BatchPredictor(cfg, model, params, batch_size=8)
    predm = BatchPredictor(cfg, model, params, batch_size=8, mesh=mesh)
    r1 = pred1.predict(imgs)
    rm = predm.predict(imgs)
    assert len(r1) == len(rm) == 5
    _assert_same_results(rm, r1)

    with pytest.raises(ValueError):
        BatchPredictor(cfg, model, params, batch_size=3, mesh=mesh)
