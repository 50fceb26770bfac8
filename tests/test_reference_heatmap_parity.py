"""Differential: ops/heatmap.py vs the reference's own putGaussianMaps.

The reference builds keypoint heatmap targets by looping people x joints
through putGaussianMaps with sequential accumulate-then-clip
(datasets/coco_data/heatmap.py:20-41, driven by
COCO_data_pipeline.get_ground_truth:222-235 with the v<=1 draw rule).
That module is pure numpy and imports directly as an oracle; this test
replays its exact loop (same iteration order, its own putGaussianMaps)
and matches our vectorized twins against it:

- make_heatmaps_np (host twin): sum-then-clip equivalence + float32 grid;
- make_heatmaps (device): the version fused into the train step.

Tolerance 3e-6: the oracle accumulates in float64 with d2/2/sigma/sigma
division order; ours uses float32 grids and d2/(2*sigma^2).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from multiposenet_tpu.ops.heatmap import make_heatmaps, make_heatmaps_np

from tests.reference_oracle import REFERENCE_ROOT


def _ref_heatmap_module():
    import sys
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        from datasets.coco_data import heatmap  # noqa: E402
    return heatmap


def _ref_targets(joints, crop, stride, sigma, hm_mod):
    """The reference get_ground_truth loop (COCO_data_pipeline.py:222-235):
    person-major sequential accumulation, draw iff v <= 1."""
    params = {"crop_size_y": crop, "crop_size_x": crop,
              "stride": stride, "sigma": sigma}
    grid = int(crop / stride)
    heat = np.zeros((grid, grid, joints.shape[1]))
    for i in range(joints.shape[1]):
        for p in range(joints.shape[0]):
            if joints[p, i, 2] <= 1:
                heat[:, :, i] = hm_mod.putGaussianMaps(
                    joints[p, i, :2], heat[:, :, i], params)
    return heat


@pytest.mark.parametrize("seed,people", [(0, 1), (1, 3), (2, 6), (3, 2)])
def test_heatmaps_match_reference(seed, people):
    hm_mod = _ref_heatmap_module()
    crop, stride, sigma = 64, 4, 7.0
    rng = np.random.RandomState(seed)
    joints = np.zeros((people, 18, 3), np.float64)
    # spread inside and slightly outside the crop; overlapping people so
    # the accumulate-then-clip vs sum-then-clip equivalence is exercised
    joints[:, :, 0] = rng.uniform(-8, crop + 8, (people, 18))
    joints[:, :, 1] = rng.uniform(-8, crop + 8, (people, 18))
    joints[:, :, 2] = rng.choice([0.0, 1.0, 2.0], (people, 18),
                                 p=[0.4, 0.4, 0.2])
    # force at least one saturated cell: two people on the same spot
    if people >= 2:
        joints[1, 0] = joints[0, 0] * np.array([1.0, 1.0, 0.0])

    ref = _ref_targets(joints, crop, stride, sigma, hm_mod)
    grid = crop // stride

    ours_np = make_heatmaps_np(joints, grid, grid, stride, sigma)
    np.testing.assert_allclose(ours_np, ref, atol=3e-6)

    ours_dev = np.asarray(make_heatmaps(jnp.asarray(joints), grid, grid,
                                        stride, sigma))
    np.testing.assert_allclose(ours_dev, ref, atol=3e-6)

    # the saturation clip actually fired somewhere (test has teeth)
    if people >= 2:
        assert (ref >= 1.0).any()


def test_all_invisible_is_zero():
    hm_mod = _ref_heatmap_module()
    joints = np.full((2, 18, 3), 2.0)
    ref = _ref_targets(joints, 64, 4, 7.0, hm_mod)
    ours = make_heatmaps_np(joints, 16, 16, 4, 7.0)
    assert ref.max() == 0.0 and ours.max() == 0.0
