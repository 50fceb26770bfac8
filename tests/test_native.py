"""Native C++ host library vs numpy twins."""

import numpy as np
import pytest

from multiposenet_tpu import native
from multiposenet_tpu.data.rle import encode_rle
from multiposenet_tpu.ops.heatmap import make_heatmaps_np

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built (no g++?)")


def test_native_rle_matches_python(rng):
    for _ in range(5):
        m = (rng.rand(45, 63) > 0.6).astype(np.uint8)
        rle = encode_rle(m)
        from multiposenet_tpu.data.rle import _decode_counts
        counts = np.asarray(_decode_counts(rle["counts"]), np.int64)
        got = native.rle_decode_native(counts, 45, 63)
        np.testing.assert_array_equal(got, m)


def test_native_nms_matches_device_semantics(rng):
    from multiposenet_tpu.ops.nms import nms_fixed
    import jax.numpy as jnp

    n = 100
    ctr = rng.uniform(20, 300, (n, 2))
    wh = rng.uniform(10, 90, (n, 2))
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)

    order = np.argsort(-scores)
    keep_native = native.cpu_nms_native(boxes[order], 0.5)
    got = order[keep_native].tolist()

    res = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_out=n)
    expect = [int(i) for i in np.asarray(res.indices) if i >= 0]
    assert got == expect


def test_native_gaussian_maps_match_numpy():
    joints = np.array(
        [[[60.0, 40.0, 1.0], [200.0, 100.0, 0.0], [10.0, 10.0, 2.0]],
         [[65.0, 45.0, 1.0], [1.0, 1.0, 2.0], [1.0, 1.0, 2.0]]], np.float32)
    got = native.put_gaussian_maps_native(joints, 120, 120, 4, 7.0)
    expect = make_heatmaps_np(joints, 120, 120, 4, 7.0)
    np.testing.assert_allclose(got, expect, atol=1e-5)
