"""Pallas NMS kernel vs XLA nms_fixed (interpreter mode on the CPU mesh)."""

import numpy as np
import jax.numpy as jnp

from multiposenet_tpu.ops.nms import nms_fixed
from multiposenet_tpu.ops.pallas_nms import nms_fixed_pallas


def _random_boxes(n, rng):
    ctr = rng.uniform(20, 300, (n, 2))
    wh = rng.uniform(10, 100, (n, 2))
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    return boxes, scores


def test_pallas_matches_xla_nms(rng):
    for trial in range(3):
        boxes, scores = _random_boxes(80, rng)
        a = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                      max_out=64, score_thresh=0.05)
        b = nms_fixed_pallas(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                             max_out=64, score_thresh=0.05, interpret=True)
        np.testing.assert_array_equal(np.asarray(a.keep), np.asarray(b.keep))
        np.testing.assert_array_equal(np.asarray(a.indices),
                                      np.asarray(b.indices))
        np.testing.assert_allclose(np.asarray(a.boxes), np.asarray(b.boxes))


def test_pallas_nms_all_below_threshold(rng):
    boxes, scores = _random_boxes(20, rng)
    r = nms_fixed_pallas(jnp.asarray(boxes), jnp.asarray(scores * 0.001),
                         0.5, max_out=16, score_thresh=0.05, interpret=True)
    assert int(np.asarray(r.keep).sum()) == 0


def test_pallas_nms_padding_capacity(rng):
    boxes, scores = _random_boxes(10, rng)
    r = nms_fixed_pallas(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                         max_out=32, score_thresh=0.0, interpret=True)
    assert r.keep.shape == (32,)
    assert (np.asarray(r.scores)[np.asarray(r.keep) == 0] == -1).all()
