"""BN folding (models/fold_bn.py): folded graph == unfolded inference.

The fold must be an inference-graph rewrite only: same outputs up to
float reassociation, BN modules gone from the variables, training
explicitly refused.  Reference context: every trunk BN pairs with a
bias-free conv (reference network/fpn.py:9-42), which is what makes the
fold exact.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiposenet_tpu.config import Config
from multiposenet_tpu.models.fold_bn import fold_bn_variables
from multiposenet_tpu.models.posenet import PoseNet


def _randomize_bn(variables, seed=0):
    """Make every BN affine non-trivial (init is mean=0/var=1/scale=1)."""
    rng = np.random.RandomState(seed)

    def walk(tree, fn):
        return {k: walk(v, fn) if hasattr(v, "items") else fn(k, v)
                for k, v in tree.items()}

    def perturb_param(k, v):
        if k in ("scale", "bias"):
            return jnp.asarray(
                np.asarray(v) + rng.uniform(-0.5, 0.5, v.shape), v.dtype)
        return v

    def perturb_stat(k, v):
        if k == "mean":
            return jnp.asarray(rng.uniform(-1, 1, v.shape), v.dtype)
        if k == "var":
            return jnp.asarray(rng.uniform(0.25, 4.0, v.shape), v.dtype)
        return v

    # scale/bias exist on BN modules only (trunk convs are bias-free and
    # the head convs' biases are also fine to perturb — they pass through)
    return {"params": walk(variables["params"], perturb_param),
            "batch_stats": walk(variables["batch_stats"], perturb_stat)}


@pytest.fixture(scope="module")
def folded_pair():
    cfg = Config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, backbone="resnet50"))
    model = PoseNet(cfg.model)
    size = 64
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, size, size, 3), jnp.float32),
        jnp.zeros((1, cfg.model.prn_height, cfg.model.prn_width, 17),
                  jnp.float32),
        method=PoseNet.init_all)
    variables = _randomize_bn(variables)

    folded_cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, fold_bn=True))
    folded_model = PoseNet(folded_cfg.model)
    folded_vars = fold_bn_variables(variables)
    return cfg, model, variables, folded_model, folded_vars, size


def test_folded_tree_shape(folded_pair):
    _, _, variables, _, folded_vars, _ = folded_pair
    assert set(folded_vars) == {"params"}
    flat = jax.tree_util.tree_flatten_with_path(folded_vars)[0]
    names = {"/".join(str(k) for k in path) for path, _ in flat}
    gone = ("'bn1'", "'bn2'", "'bn3'", "'downsample_bn'")
    assert not any(g in n for n in names for g in gone), \
        "BN params must be gone"
    # param count: every folded conv trades (scale,bias,mean,var) for bias
    n_before = sum(x.size for x in jax.tree_util.tree_leaves(variables))
    n_after = sum(x.size for x in jax.tree_util.tree_leaves(folded_vars))
    assert n_after < n_before


def test_folded_forward_matches(folded_pair):
    cfg, model, variables, folded_model, folded_vars, size = folded_pair
    img = jnp.asarray(
        np.random.RandomState(1).rand(2, size, size, 3), jnp.float32) * 255
    heat, cls, reg = model.apply(variables, img,
                                 method=PoseNet.full_forward)
    fheat, fcls, freg = folded_model.apply(folded_vars, img,
                                           method=PoseNet.full_forward)
    # float reassociation only: tolerances far inside every decision
    # margin measured in docs/PERF.md's bf16 drift table
    np.testing.assert_allclose(np.asarray(fheat), np.asarray(heat),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(fcls), np.asarray(cls),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(freg), np.asarray(reg),
                               rtol=0, atol=2e-3)


def test_folded_keypoint_forward_matches(folded_pair):
    cfg, model, variables, folded_model, folded_vars, size = folded_pair
    img = jnp.asarray(
        np.random.RandomState(2).rand(1, size, size, 3), jnp.float32) * 255
    heat, _ = model.apply(variables, img, method=PoseNet.keypoint_forward)
    fheat, _ = folded_model.apply(folded_vars, img,
                                  method=PoseNet.keypoint_forward)
    np.testing.assert_allclose(np.asarray(fheat), np.asarray(heat),
                               rtol=0, atol=2e-4)


def test_fold_bn_refuses_training(folded_pair):
    _, _, _, folded_model, folded_vars, size = folded_pair
    img = jnp.zeros((1, size, size, 3), jnp.float32)
    with pytest.raises(AssertionError):
        folded_model.apply(folded_vars, img, train=True,
                           method=PoseNet.keypoint_forward)
