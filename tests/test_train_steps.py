"""Train-step tests: freezing semantics, loss decrease, mesh sharding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiposenet_tpu.config import Config, ModelConfig, DataConfig
from multiposenet_tpu.engine.train_steps import (
    TRAINABLE_GROUPS,
    create_train_state,
    make_detection_steps,
    make_keypoint_steps,
    make_prn_steps,
    param_group,
    trainable_mask,
)
from multiposenet_tpu.models.posenet import PoseNet
from multiposenet_tpu.parallel import make_mesh, shard_batch



def tiny_config(**data_kw):
    return Config(
        model=ModelConfig(backbone="resnet50"),
        data=DataConfig(inp_size=96, **data_kw),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    model = PoseNet(cfg.model)
    state, tx, mask = create_train_state(
        model, cfg, jax.random.PRNGKey(0), (96, 96), "keypoint")
    return cfg, model, state, tx, mask


def test_param_groups_cover_tree(setup):
    _, _, state, _, _ = setup
    groups = set()
    for path, _ in jax.tree_util.tree_flatten_with_path(state.params)[0]:
        groups.add(param_group(tuple(k.key for k in path)))
    assert groups == {"fpn_resnet", "fpn_retina", "fpn_keypoint",
                      "keypoint", "retinanet", "prn"}


def test_trainable_masks_disjoint_stage_semantics(setup):
    _, _, state, _, _ = setup
    for subnet, expect in TRAINABLE_GROUPS.items():
        m = trainable_mask(state.params, subnet)
        flat = jax.tree_util.tree_flatten_with_path(m)[0]
        for path, v in flat:
            g = param_group(tuple(k.key for k in path))
            assert v == (g in expect), (subnet, path, g)


def _keypoint_batch(b=2, size=96):
    rng = np.random.RandomState(0)
    img = (rng.rand(b, size, size, 3) * 255).astype(np.uint8)
    joints = np.full((b, 3, 18, 3), 2.0, np.float32)
    joints[:, 0, :, 0] = rng.uniform(10, size - 10, (b, 18))
    joints[:, 0, :, 1] = rng.uniform(10, size - 10, (b, 18))
    joints[:, 0, :, 2] = 1.0
    m = np.ones((b, size // 4, size // 4), np.float32)
    return {"image": jnp.asarray(img), "joints": jnp.asarray(joints),
            "mask": jnp.asarray(m)}


@pytest.mark.slow  # compile-heavy (tiering: docs/TESTING.md)
def test_keypoint_train_step_decreases_loss_and_freezes(setup):
    cfg, model, state, tx, mask = setup
    train_step, val_step = make_keypoint_steps(model, cfg, tx, mask)
    batch = _keypoint_batch()

    # materialize: the step donates state buffers, references would die
    frozen_before = jax.tree.map(np.asarray, state.params["prn"])
    det_before = jax.tree.map(np.asarray, state.params["regression_head"])

    losses = []
    for _ in range(3):
        # reference keypoint lr (multipose_keypoint_train.py:108); 1e-3
        # diverges from random init within 3 adam steps
        state, logs = train_step(state, batch, jnp.asarray(1e-4))
        losses.append(float(logs["loss"]))
    assert losses[-1] < losses[0], losses
    assert set(logs) >= {"heatmap_loss", "heatmap_loss_k2", "max_ht", "loss"}

    # frozen subnets unchanged
    for a, b in zip(jax.tree.leaves(frozen_before), jax.tree.leaves(state.params["prn"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(det_before), jax.tree.leaves(state.params["regression_head"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    v = val_step(state, batch)
    assert np.isfinite(float(v["loss"]))


@pytest.mark.slow  # compile-heavy (tiering: docs/TESTING.md)
def test_detection_train_step_runs():
    cfg = tiny_config()
    model = PoseNet(cfg.model)
    state, tx, mask = create_train_state(
        model, cfg, jax.random.PRNGKey(0), (96, 96), "detection")
    train_step, val_step = make_detection_steps(model, cfg, tx, mask,
                                                image_hw=(96, 96))
    rng = np.random.RandomState(0)
    img = (rng.rand(2, 96, 96, 3) * 255).astype(np.uint8)
    boxes = np.full((2, 4, 5), -1.0, np.float32)
    boxes[0, 0] = [10, 10, 60, 80, 0]
    boxes[1, 0] = [20, 5, 70, 90, 0]
    batch = {"image": jnp.asarray(img), "boxes": jnp.asarray(boxes)}

    bb_before = np.array(jax.tree.leaves(state.params["fpn"]["layer1_0"])[0])
    losses = []
    for _ in range(3):
        state, logs = train_step(state, batch, jnp.asarray(1e-4))
        losses.append(float(logs["loss"]))
    assert losses[-1] < losses[0], losses
    # resnet trunk frozen in detection stage
    bb_after = np.asarray(jax.tree.leaves(state.params["fpn"]["layer1_0"])[0])
    np.testing.assert_array_equal(bb_before, bb_after)
    assert np.isfinite(float(val_step(state, batch)["loss"]))


def test_prn_train_step_runs():
    cfg = tiny_config()
    model = PoseNet(cfg.model)
    state, tx, mask = create_train_state(
        model, cfg, jax.random.PRNGKey(0), (96, 96), "prn")
    train_step, val_step = make_prn_steps(model, cfg, tx, mask)
    rng = np.random.RandomState(0)
    gh, gw = cfg.model.prn_height, cfg.model.prn_width
    wm = (rng.rand(2, gh, gw, 17) > 0.99).astype(np.float32)
    lm = (rng.rand(2, gh, gw, 17) > 0.995).astype(np.float32)
    batch = {"weights_marks": jnp.asarray(wm), "label_marks": jnp.asarray(lm)}

    losses = []
    for i in range(3):
        state, logs = train_step(state, batch, jnp.asarray(1e-3),
                                 jax.random.PRNGKey(i))
        losses.append(float(logs["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(float(val_step(state, batch)["loss"]))


def test_prn_grid_impls_equivalent():
    """'matmul' (blur-operator einsum) and 'conv' (separable depthwise)
    grid builds are the same function: identical val loss and identical
    one-step training trajectory from the same init/rng."""
    cfg = tiny_config()
    model = PoseNet(cfg.model)
    rng = np.random.RandomState(1)
    gh, gw = cfg.model.prn_height, cfg.model.prn_width
    batch = {
        "weights_marks": jnp.asarray(
            (rng.rand(2, gh, gw, 17) > 0.99).astype(np.float32)),
        "label_marks": jnp.asarray(
            (rng.rand(2, gh, gw, 17) > 0.995).astype(np.float32)),
    }
    losses, stepped = [], []
    for impl in ("matmul", "conv"):
        state, tx, mask = create_train_state(
            model, cfg, jax.random.PRNGKey(0), (96, 96), "prn")
        train_step, val_step = make_prn_steps(model, cfg, tx, mask,
                                              grid_impl=impl)
        losses.append(float(val_step(state, batch)["loss"]))
        state, _ = train_step(state, batch, jnp.asarray(1e-3),
                              jax.random.PRNGKey(7))
        stepped.append(jax.tree.map(np.asarray, state.params["prn"]))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
    for a, b in zip(jax.tree.leaves(stepped[0]), jax.tree.leaves(stepped[1])):
        np.testing.assert_allclose(a, b, atol=1e-6)


@pytest.mark.slow  # compile-heavy (tiering: docs/TESTING.md)
def test_detection_and_prn_steps_on_8_device_mesh():
    """Detection and PRN stages also run data-parallel over the mesh."""
    assert jax.device_count() >= 8
    from multiposenet_tpu.parallel import replicated
    cfg = tiny_config()
    model = PoseNet(cfg.model)
    mesh = make_mesh((-1,), ("data",))
    rng = np.random.RandomState(0)

    # detection
    state, tx, mask = create_train_state(
        model, cfg, jax.random.PRNGKey(0), (96, 96), "detection")
    step, _ = make_detection_steps(model, cfg, tx, mask, mesh=mesh,
                                   image_hw=(96, 96))
    state = jax.device_put(state, replicated(mesh))
    boxes = np.full((8, 4, 5), -1.0, np.float32)
    boxes[:, 0] = [10, 10, 60, 80, 0]
    batch = shard_batch(mesh, {
        "image": jnp.asarray((rng.rand(8, 96, 96, 3) * 255).astype(np.uint8)),
        "boxes": jnp.asarray(boxes)})
    state, logs = step(state, batch, jnp.asarray(1e-4))
    assert np.isfinite(float(logs["loss"]))

    # prn
    state, tx, mask = create_train_state(
        model, cfg, jax.random.PRNGKey(0), (96, 96), "prn")
    step, _ = make_prn_steps(model, cfg, tx, mask, mesh=mesh)
    state = jax.device_put(state, replicated(mesh))
    gh, gw = cfg.model.prn_height, cfg.model.prn_width
    batch = shard_batch(mesh, {
        "weights_marks": jnp.asarray((rng.rand(8, gh, gw, 17) > 0.99)
                                     .astype(np.float32)),
        "label_marks": jnp.asarray((rng.rand(8, gh, gw, 17) > 0.995)
                                   .astype(np.float32))})
    state, logs = step(state, batch, jnp.asarray(1e-3), jax.random.PRNGKey(0))
    assert np.isfinite(float(logs["loss"]))


@pytest.mark.slow  # compile-heavy (tiering: docs/TESTING.md)
def test_sharded_inference_pipeline_on_mesh():
    """DP inference: replicated params, batch-sharded images."""
    assert jax.device_count() >= 8
    from multiposenet_tpu.engine.inference import make_sharded_pipeline
    from multiposenet_tpu.parallel import replicated

    cfg = tiny_config()
    model = PoseNet(cfg.model)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)),
        jnp.zeros((1, cfg.model.prn_height, cfg.model.prn_width, 17)),
        method=PoseNet.init_all)
    mesh = make_mesh((-1,), ("data",))
    pipe = make_sharded_pipeline(model, cfg, (96, 96), mesh)
    variables = jax.device_put(variables, replicated(mesh))
    imgs = shard_batch(mesh, jnp.zeros((8, 96, 96, 3), jnp.uint8))
    out = pipe(variables, imgs)
    assert out.heatmaps.shape == (8, 24, 24, 18)
    assert not out.heatmaps.sharding.is_fully_replicated  # stays sharded


@pytest.mark.slow  # compile-heavy (tiering: docs/TESTING.md)
def test_keypoint_step_on_8_device_mesh():
    """Data-parallel train step over the virtual 8-device CPU mesh."""
    assert jax.device_count() >= 8
    cfg = tiny_config()
    model = PoseNet(cfg.model)
    state, tx, mask = create_train_state(
        model, cfg, jax.random.PRNGKey(0), (96, 96), "keypoint")
    mesh = make_mesh((-1,), ("data",))
    train_step, _ = make_keypoint_steps(model, cfg, tx, mask, mesh=mesh)

    from multiposenet_tpu.parallel import replicated
    state = jax.device_put(state, replicated(mesh))
    batch = shard_batch(mesh, _keypoint_batch(b=8))
    state, logs = train_step(state, batch, jnp.asarray(1e-3))
    assert np.isfinite(float(logs["loss"]))
    # params stay replicated after the step
    p0 = jax.tree.leaves(state.params)[0]
    assert p0.sharding.is_fully_replicated
